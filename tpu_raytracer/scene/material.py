"""Material record (reference: CudaRaytracer/Material.hpp:6-44).

A material is a PBR-ish record: roughness, albedo, metallic, emissive
``illumination`` scalar, and an optional texture. The reference stores
textures as raw pitched uchar3 device buffers loaded with OpenCV
(Material.hpp:29-43); here a texture is a host numpy ``[H, W, 3]`` uint8
array that scene compilation packs into a flat atlas (scene.py).

Channel order follows the reference: images loaded from disk keep
OpenCV's BGR layout, so compiled images compare bit-for-bit against the
reference's uchar3 (.x, .y, .z) output.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Material:
    albedo: tuple = (1.0, 1.0, 1.0)
    roughness: float = 0.0
    metallic: float = 0.0
    illumination: float = 0.0
    # Extensions over the reference's active feature set (its disabled
    # scaffolding, raycast.cu:263-287, done properly behind flags):
    reflectivity: float = 0.0  # Whitted mirror reflection weight
    texture: np.ndarray | None = None  # [H, W, 3] uint8

    def upload_texture(self, fp: str) -> None:
        """Load an image file as this material's texture
        (Material.hpp:29-43). Uses OpenCV (BGR, like the reference);
        falls back to PIL with channel swap."""
        try:
            import cv2

            img = cv2.imread(fp, cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(fp)
        except ImportError:  # pragma: no cover
            from PIL import Image

            img = np.asarray(Image.open(fp).convert("RGB"))[..., ::-1]
        self.set_texture(np.asarray(img, np.uint8))

    def set_texture(self, img: np.ndarray) -> None:
        """Attach an in-memory [H, W, 3] uint8 texture."""
        img = np.asarray(img, np.uint8)
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"texture must be [H, W, 3] uint8, got {img.shape}")
        self.texture = img
