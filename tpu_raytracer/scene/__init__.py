from . import objloader, procgen
from .instance import MeshInstance
from .material import Material
from .mesh import MeshPrimitive
from .scene import Scene, SceneArrays

__all__ = [
    "Material",
    "MeshInstance",
    "MeshPrimitive",
    "Scene",
    "SceneArrays",
    "objloader",
    "procgen",
]
