"""Minimal end-to-end render: build a scene, compile it, render one
frame, save a PNG. (The reference's kernel.cu:141-302 demo, distilled.)

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python examples/01_basic_render.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root
import numpy as np

from tpu_raytracer.render import Camera, render
from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen
from tpu_raytracer.utils import save_png

scene = Scene()
scene.add_material(Material(albedo=(0.2, 0.4, 0.9)))
checker = Material()
checker.set_texture(procgen.checkerboard_texture(128, 16))
scene.add_material(checker)

scene.add_mesh(objloader.loads(procgen.cube_obj()))

blue = MeshInstance(0, 0)
blue.pose = np.array([-1.2, 0.0, 0.0, 0.3, 0.2, 0.0], np.float32)
scene.add_mesh_instance(blue)
tex = MeshInstance(0, 1)
tex.pose = np.array([1.2, 0.5, 0.0, -0.2, 0.0, 0.1], np.float32)
scene.add_mesh_instance(tex)

arrays = scene.compile()  # -> SceneArrays (SoA pytree, BVH built + packed)

camera = Camera.looking(256, 256, fov_deg=60.0, pose=[0, -5, 0.5, 0, 0, 0])
img = np.asarray(render(camera, arrays, lighting="lambert"))
save_png(img, "/tmp/example_basic.png")
print("wrote /tmp/example_basic.png", img.shape, img.dtype)
