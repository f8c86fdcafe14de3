from .compile_cache import enable as enable_compilation_cache
from .image import overlay_fps, save_png

__all__ = ["enable_compilation_cache", "overlay_fps", "save_png"]
