"""Two-level TLAS/BLAS traversal (kernels/tlas.py) in the CPU suite."""

import numpy as np

from tpu_raytracer.kernels.tlas import build_tlas, cast_rays_tlas
from tpu_raytracer.kernels.traversal import cast_rays_pallas
from tpu_raytracer.render.camera import generate_rays
from tpu_raytracer.render.renderer import cast_rays_brute

from test_pallas_interpret import _two_instance_scene


def _rays(cam):
    p = cam.ray_params()
    return generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])


def _many_instance_scene(n=9):
    """A grid of posed/scaled instances of two meshes — the TLAS's
    target workload (the reference's linear loop costs N traversals
    per ray here, raycast.cu:26-51)."""
    from tpu_raytracer.render import Camera
    from tpu_raytracer.scene import (
        Material, MeshInstance, MeshPrimitive, Scene, objloader, procgen,
    )

    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
    scene.add_material(Material(albedo=(0.2, 0.6, 0.9)))
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    v0, v1, v2 = procgen.icosphere(2)
    scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2))
    rng = np.random.default_rng(7)
    side = int(np.ceil(np.sqrt(n)))
    for k in range(n):
        inst = MeshInstance(k % 2, k % 2)
        gx, gz = k % side, k // side
        inst.pose = np.array(
            [(gx - side / 2) * 2.2, rng.uniform(-1, 1),
             (gz - side / 2) * 2.2,
             rng.uniform(0, 3), rng.uniform(0, 1), 0.0],
            np.float32,
        )
        inst.scale = np.array(
            [rng.uniform(0.6, 1.2) for _ in range(3)], np.float32
        )
        scene.add_mesh_instance(inst)
    cam = Camera.looking(64, 64, fov_deg=70.0, pose=[0, -12, 0, 0, 0, 0])
    return scene.compile(), cam


def test_compile_attaches_tlas():
    arrays, _ = _two_instance_scene()
    assert arrays.tlas is not None
    assert arrays.tlas.inst_ids.shape[0] == arrays.num_instances


def test_tlas_matches_linear_kernel_two_instances(monkeypatch):
    arrays, cam = _two_instance_scene()
    o, d = _rays(cam)
    monkeypatch.setenv("TRT_TLAS", "0")
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    got = cast_rays_tlas(arrays, o, d, interpret=True)
    # tri/inst ids bit-exact; t to fp tolerance (cross-program FMA
    # contraction shifts t by ~2 ulps — shading recomputes attributes
    # from tri/inst, so images are unaffected)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.inst), np.asarray(ref.inst))
    np.testing.assert_allclose(
        np.asarray(got.t), np.asarray(ref.t), rtol=2e-6
    )


def test_tlas_matches_brute_many_instances():
    arrays, cam = _many_instance_scene(9)
    o, d = _rays(cam)
    got = cast_rays_tlas(arrays, o, d, interpret=True)
    ref = cast_rays_brute(arrays, o, d)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.inst), np.asarray(ref.inst))
    np.testing.assert_allclose(
        np.asarray(got.t), np.asarray(ref.t), rtol=2e-6
    )
    # all instances visible (the scene really exercises the TLAS)
    assert len(np.unique(np.asarray(got.inst))) >= 8


def test_tlas_rebuilt_on_instance_update():
    from tpu_raytracer.scene import MeshInstance

    arrays, cam = _two_instance_scene()
    moved = MeshInstance(0, 1)
    moved.pose = np.array([3.0, 1.0, 0.0, 0.0, 0.0, 0.0], np.float32)
    updated = arrays.update_instance(0, moved)
    assert updated.tlas is not None
    # the TLAS really reflects the new pose: hits move with the box
    o, d = _rays(cam)
    a = cast_rays_tlas(arrays, o, d, interpret=True)
    b = cast_rays_tlas(updated, o, d, interpret=True)
    assert (np.asarray(a.inst) != np.asarray(b.inst)).any()
    ref = cast_rays_brute(updated, o, d)
    np.testing.assert_array_equal(np.asarray(b.tri), np.asarray(ref.tri))


def test_tlas_rendered_image_matches_brute():
    """End-to-end through the public pipeline: the default pallas
    routing (TLAS on) must produce the same image as brute."""
    from tpu_raytracer.render import render

    arrays, cam = _many_instance_scene(6)
    a = np.asarray(render(cam, arrays, backend="pallas"))
    b = np.asarray(render(cam, arrays, backend="brute"))
    assert (a == b).all(), f"{(a != b).any(-1).sum()} pixels differ"


def test_tlas_wide_matches_binary_blas(monkeypatch):
    """The 4-wide BLAS path (default when scene.wide4 is attached) and
    the binary BLAS path (TRT_TLAS_WIDE=0) agree bit-for-bit."""
    from tpu_raytracer.render.camera import generate_rays

    arrays, cam = _two_instance_scene()
    assert arrays.wide4 is not None  # compile attached the wide tables
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    got = cast_rays_tlas(arrays, o, d, interpret=True)
    monkeypatch.setenv("TRT_TLAS_WIDE", "0")
    ref = cast_rays_tlas(arrays, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.inst), np.asarray(ref.inst))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
