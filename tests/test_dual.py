"""Dual-tile interleaved kernel (kernels/dual.py) in the CPU suite.

The dual-wide kernel is the DEFAULT flagship path (cast_rays_pallas
routing), so it needs a pre-TPU oracle like the linear and wide4
kernels. Covers both leaf-drain modes: the compacted flat drain
(TRT_LEAF_COMPACT, default) and the per-slot fori fallback.
"""

import numpy as np
import pytest

from tpu_raytracer.kernels.dual import cast_rays_dual
from tpu_raytracer.kernels.traversal import cast_rays_pallas
from tpu_raytracer.render.camera import generate_rays

from test_pallas_interpret import _two_instance_scene


@pytest.fixture()
def _scene_rays(monkeypatch):
    # bit-exact reference = the resident linear kernel
    monkeypatch.setenv("TRT_TLAS", "0")
    monkeypatch.setenv("TRT_DUAL", "0")
    arrays, cam = _two_instance_scene()
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    return arrays, o, d, ref


def _check(got, ref):
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).all()
    assert (np.asarray(got.inst) == np.asarray(ref.inst)).all()
    t_g, t_r = np.asarray(got.t), np.asarray(ref.t)
    np.testing.assert_allclose(t_g, t_r, rtol=1e-6, atol=1e-6)


def test_dual_wide_flat_drain(_scene_rays, monkeypatch):
    arrays, o, d, ref = _scene_rays
    monkeypatch.setenv("TRT_LEAF_COMPACT", "1")
    assert arrays.wide4.max_leaf <= 16  # flat drain actually engages
    _check(cast_rays_dual(arrays, o, d, interpret=True, wide=True), ref)


def test_dual_wide_fori_drain(_scene_rays, monkeypatch):
    arrays, o, d, ref = _scene_rays
    monkeypatch.setenv("TRT_LEAF_COMPACT", "0")
    _check(cast_rays_dual(arrays, o, d, interpret=True, wide=True), ref)


def test_dual_binary(_scene_rays):
    arrays, o, d, ref = _scene_rays
    _check(cast_rays_dual(arrays, o, d, interpret=True, wide=False), ref)


def test_dual_wide_uniform_origin(_scene_rays, monkeypatch):
    arrays, o, d, ref = _scene_rays
    monkeypatch.setenv("TRT_LEAF_COMPACT", "1")
    o3 = np.asarray(o).reshape(-1, 3)[0]
    got = cast_rays_dual(arrays, o3, d, interpret=True, wide=True)
    _check(got, ref)
