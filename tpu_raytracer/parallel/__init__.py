from .sharding import (
    make_mesh,
    render_image_path_traced_sharded,
    render_image_sharded,
    render_image_whitted_sharded,
)

__all__ = [
    "make_mesh",
    "render_image_path_traced_sharded",
    "render_image_sharded",
    "render_image_whitted_sharded",
]
