"""AOV render tests (render_aovs — framework extension; the reference
writes only the beauty image, raycast.cu:292-294)."""

import numpy as np

from tpu_raytracer.render import Camera, RenderConfig, render_aovs
from tpu_raytracer.render.renderer import cast_rays_bvh, hit_attributes
from tpu_raytracer.render.camera import generate_rays
from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen


def _scene():
    scene = Scene()
    scene.add_material(Material(albedo=(0.5, 0.5, 0.5)))
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    a = MeshInstance(0, 0)
    b = MeshInstance(0, 0)
    b.pose = np.array([2.0, 1.0, 0.0, 0.3, 0, 0], np.float32)
    scene.add_mesh_instance(a)
    scene.add_mesh_instance(b)
    cam = Camera.looking(48, 48, fov_deg=55.0, pose=[0.8, -4, 0, 0, 0, 0])
    return scene.compile(), cam


def test_aovs_consistent_with_cast():
    arrays, cam = _scene()
    cfg = RenderConfig(width=48, height=48, backend="bvh")
    p = cam.ray_params()
    bufs = {k: np.asarray(v) for k, v in render_aovs(
        cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]
    ).items()}

    origin, directions = generate_rays(
        48, 48, p["K_inv"], p["D"], p["pose"], p["inv_pose"]
    )
    hit = cast_rays_bvh(arrays, origin, directions)
    attrs = hit_attributes(arrays, origin, directions, hit)
    want_hit = np.asarray(attrs.hit)

    assert (bufs["hit"] == want_hit).all()
    assert want_hit.any() and not want_hit.all()
    # depth: +inf exactly on misses, equals attrs.t on hits (allclose:
    # render_aovs runs under jit whose fusion reorders fp vs this
    # eager reference cast)
    assert np.isinf(bufs["depth"][~want_hit]).all()
    np.testing.assert_allclose(
        bufs["depth"][want_hit], np.asarray(attrs.t)[want_hit], rtol=1e-4
    )
    # normals unit length on hits, zero on misses
    n = bufs["normal"]
    ln = np.linalg.norm(n[want_hit], axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-4)
    assert (n[~want_hit] == 0).all()
    # ids: -1 on miss, valid on hit; both instances visible
    assert (bufs["instance"][~want_hit] == -1).all()
    assert (bufs["triangle"][~want_hit] == -1).all()
    ids = set(np.unique(bufs["instance"][want_hit]))
    assert ids == {0, 1}, ids
    assert (bufs["triangle"][want_hit] >= 0).all()
    assert (bufs["triangle"][want_hit] < arrays.tri_v0.shape[0]).all()
