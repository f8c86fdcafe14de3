"""Environment-map sky tests (Scene.set_sky — framework extension; the
reference's miss color is the flat constant raycast.cu:211-213)."""

import numpy as np

from tpu_raytracer.render import Camera, RenderConfig, render
from tpu_raytracer.render.shade import SKY_COLOR, sky_radiance
from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen


def _sky_tex():
    """Equirect test map: top half solid red-ish, bottom half blue-ish,
    in the engine's (b, g, r)-style channel slots."""
    tex = np.zeros((64, 128, 3), np.uint8)
    tex[:32] = (200, 30, 40)
    tex[32:] = (20, 60, 220)
    return tex


def _scene(with_sky):
    scene = Scene()
    scene.add_material(Material(albedo=(0.5, 0.5, 0.5)))
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    scene.add_mesh_instance(MeshInstance(0, 0))
    if with_sky:
        scene.set_sky(_sky_tex())
    return scene.compile()


def test_sky_radiance_hemispheres():
    arrays = _scene(True)
    up = np.array([[0.0, 0.0, 1.0]], np.float32)
    down = np.array([[0.0, 0.0, -1.0]], np.float32)
    r_up = np.asarray(sky_radiance(arrays, up))[0]
    r_dn = np.asarray(sky_radiance(arrays, down))[0]
    np.testing.assert_allclose(r_up * 255, (200, 30, 40), atol=1.0)
    np.testing.assert_allclose(r_dn * 255, (20, 60, 220), atol=1.0)


def test_sky_radiance_flat_fallback_is_exact():
    arrays = _scene(False)
    d = np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)
    r = np.asarray(sky_radiance(arrays, d))
    want = np.asarray(SKY_COLOR, np.float32) / 255.0
    assert (r == want).all()


def test_sky_render_end_to_end():
    arrays = _scene(True)
    cam = Camera.looking(64, 64, fov_deg=60.0, pose=[0, -4, 0, 0, 0, 0])
    img = np.asarray(render(cam, arrays, RenderConfig(64, 64, backend="bvh")))
    flat = np.array(SKY_COLOR, np.uint8)
    # no pixel keeps the flat constant; miss pixels split into the two
    # hemisphere colors (camera level: both visible)
    assert not (img == flat).all(-1).any()
    top_colors = set(map(tuple, img[0]))
    bot_colors = set(map(tuple, img[-1]))
    assert top_colors != bot_colors
