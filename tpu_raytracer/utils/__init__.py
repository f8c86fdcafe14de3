from .image import overlay_fps, save_png

__all__ = ["overlay_fps", "save_png"]
