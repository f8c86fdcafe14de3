from .scene_shard import (
    cast_rays_scene_sharded,
    render_image_path_scene_sharded,
    render_image_scene_sharded,
    render_image_whitted_scene_sharded,
    shard_compile,
)
from .sharding import (
    make_mesh,
    render_image_path_traced_sharded,
    render_image_sharded,
    render_image_whitted_sharded,
)

__all__ = [
    "cast_rays_scene_sharded",
    "make_mesh",
    "render_image_path_scene_sharded",
    "render_image_path_traced_sharded",
    "render_image_scene_sharded",
    "render_image_sharded",
    "render_image_whitted_sharded",
    "render_image_whitted_scene_sharded",
    "shard_compile",
]
