"""Kernel-carried barycentric u/v (Hit.u/v on textured scenes).

The Pallas kernels select the accepted triangle's u/v alongside t so
hit_attributes can skip the object-space barycentric redo — the
measured r3 attrs wall on textured scenes (one [T, 6] gather instead of
the [I, 18] + [T, 18] + transform + plane/bary chain).

Default routing: carry is ON on real TPU (where the same-device oracle
test_pallas_tpu.py enforces bit-exact pallas == brute INCLUDING the
carried-uv shading path) and OFF in CPU interpret mode, whose FMA
contraction gives ulp-level u/v drift vs the XLA oracle (the same
platform variance the TPU golden check tolerates as boundary texel
flips). These tests force the carry on (TRT_CARRY_UV=1) and pin the
honest CPU-interpret contract:

  * (t, tri, inst) selection is UNCHANGED by the carry;
  * carried u/v match the oracle redo within a tight ulp bound;
  * the shaded image matches the redo image except possibly a few
    texel-boundary flips.
"""

import numpy as np
import pytest

from tpu_raytracer.app import scenes
from tpu_raytracer.render import Camera, RenderConfig, render
from tpu_raytracer.render.camera import generate_rays
from tpu_raytracer.render.renderer import cast_rays_brute, hit_attributes
from tpu_raytracer.kernels.traversal import cast_rays_pallas


@pytest.fixture()
def carry_env(monkeypatch):
    monkeypatch.setenv("TRT_CARRY_UV", "1")


def _scene():
    # 4 textured+untextured instances @64x64: one tile, TLAS routing
    return scenes.scene_instances(64, 64)


def test_carry_uv_preserves_selection_and_bounds_uv(carry_env):
    arrays, cam = _scene()
    assert arrays.has_textures
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    hp = cast_rays_pallas(arrays, o, d, interpret=True)
    assert hp.u is not None and hp.v is not None
    hb = cast_rays_brute(arrays, o, d)
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hb.tri))
    np.testing.assert_array_equal(np.asarray(hp.inst), np.asarray(hb.inst))

    ap = hit_attributes(arrays, o, d, hp)
    ab = hit_attributes(arrays, o, d, hb)
    hit = np.asarray(ab.hit)
    duv = np.abs(np.asarray(ap.uv) - np.asarray(ab.uv))[hit]
    assert duv.max() < 1e-4, duv.max()
    dloc = np.abs(np.asarray(ap.location) - np.asarray(ab.location))[hit]
    assert dloc.max() < 1e-4, dloc.max()


def test_carry_uv_image_matches_oracle_up_to_texel_flips(carry_env):
    arrays, cam = _scene()
    img_carry = np.asarray(render(cam, arrays, backend="pallas"))
    img_oracle = np.asarray(render(cam, arrays, backend="brute"))
    flipped = (img_carry != img_oracle).any(-1).sum()
    # ulp-level uv drift can flip a nearest-neighbor texel only where
    # u*w lands within an ulp of a texel boundary — a handful of pixels
    assert flipped <= 8, f"{flipped} pixels differ"


def test_carry_n_is_a_pure_select(carry_env):
    """Hit.n must equal the gathered tri_normal bit-for-bit on every
    platform — it is a register select of the same record rows, with
    no arithmetic anywhere."""
    arrays, cam = _scene()
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    hp = cast_rays_pallas(arrays, o, d, interpret=True, want_normals=True)
    assert hp.n is not None
    tri = np.maximum(np.asarray(hp.tri), 0)
    want = np.asarray(arrays.tri_normal)[tri]
    hit = np.asarray(hp.tri) >= 0
    np.testing.assert_array_equal(np.asarray(hp.n)[hit], want[hit])


def test_carry_n_lit_image_close_to_oracle(carry_env):
    """Lit (lambert_shadow) render with carried normals vs the brute
    oracle: normals are bit-exact, but the location shortcut (plane
    point from hit.t) drifts by ulps under CPU-interpret FMA
    contraction — shadow-ray origins may flip an edge pixel."""
    arrays, cam = _scene()
    cfg = dict(backend="pallas", lighting="lambert_shadow")
    img_carry = np.asarray(render(cam, arrays, **cfg))
    img_oracle = np.asarray(render(cam, arrays, **dict(cfg, backend="brute")))
    flipped = (img_carry != img_oracle).any(-1).sum()
    assert flipped <= 8, f"{flipped} pixels differ"


def test_carry_uv_off_for_untextured_scenes(carry_env):
    from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen

    scene = Scene()
    scene.add_material(Material(albedo=(0.7, 0.2, 0.2)))
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    scene.add_mesh_instance(MeshInstance(0, 0))
    arrays = scene.compile()
    cam = Camera.looking(64, 64, fov_deg=45.0, pose=[0, -4, 0, 0, 0, 0])
    assert not arrays.has_textures
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    hp = cast_rays_pallas(arrays, o, d, interpret=True)
    assert hp.u is None and hp.v is None
