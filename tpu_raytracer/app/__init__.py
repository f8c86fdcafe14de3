from . import controls, scenes
from .driver import build_demo_scene, run

__all__ = ["build_demo_scene", "controls", "run", "scenes"]
