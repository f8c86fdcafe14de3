from .sharding import make_mesh, render_image_sharded

__all__ = ["make_mesh", "render_image_sharded"]
