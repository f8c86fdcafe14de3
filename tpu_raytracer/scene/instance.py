"""MeshInstance: a posed, scaled occurrence of a mesh with a material
(reference: CudaRaytracer/MeshInstance.hpp:6-48).

All inverse transforms are precomputed on the host by ``build_inv``
(MeshInstance.hpp:39-46) so the device never inverts anything — the
compiled instance arrays carry pose, inv_pose, rotation, inv_rotation,
scale and inv_scale side by side.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core import transforms as T


@dataclasses.dataclass
class MeshInstance:
    mesh_index: int
    material_index: int
    pose: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(6, np.float32)
    )  # lre (x, y, z, yaw, pitch, roll)
    scale: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32)
    )

    def __post_init__(self):
        self.pose = np.asarray(self.pose, np.float32).reshape(6)
        self.scale = np.asarray(self.scale, np.float32).reshape(3)

    def build_inv(self) -> dict[str, np.ndarray]:
        """Precompute the inverse transforms (MeshInstance.hpp:39-46)."""
        inv_pose = np.asarray(T.invert_lre(self.pose), np.float32)
        return {
            "pose": self.pose,
            "inv_pose": inv_pose,
            "rotation": self.pose[3:6],
            "inv_rotation": inv_pose[3:6],
            "scale": self.scale,
            "inv_scale": (1.0 / self.scale).astype(np.float32),
        }
