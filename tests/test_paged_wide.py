"""Wide-pop HBM-paged kernel (kernels/paged_wide.py) in the CPU suite.

The binary paged tests (test_paged.py) already run THROUGH this kernel
(cast_rays_paged routes to it by default when the tables carry the
per-page wide collapse); these tests additionally pin the wide/binary
in-page loop equivalence, the page-local wide build invariants, and the
TRT_PAGED_WIDE=0 escape hatch.
"""

import numpy as np
import pytest

from tpu_raytracer.kernels.paged import cast_rays_paged, prepare_paged
from tpu_raytracer.kernels.paged_wide import cast_rays_paged_wide
from tpu_raytracer.kernels.traversal import cast_rays_pallas
from tpu_raytracer.render.camera import generate_rays

from test_pallas_interpret import _two_instance_scene


@pytest.fixture(autouse=True)
def _linear_reference(monkeypatch):
    monkeypatch.setenv("TRT_TLAS", "0")
    monkeypatch.setenv("TRT_DUAL", "0")


def _rays(cam):
    p = cam.ray_params()
    return generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])


def test_page_wide_build_invariants():
    """Every page's wide table covers exactly the page's binary leaves
    (page-local starts), and internal codes stay inside the page."""
    arrays, _ = _two_instance_scene()
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    assert tables.has_wide
    assert tables.pwcode.shape[0] == tables.num_pages * tables.wcode_rows
    assert tables.pwnodef.shape[0] == tables.num_pages * tables.wnode_rows
    pwcode = np.asarray(tables.pwcode)
    page_tab = np.asarray(tables.page_tab)
    ca = np.asarray(arrays.node_child_a)
    ls = np.asarray(arrays.node_leaf_start)
    lc = np.asarray(arrays.node_leaf_count)
    want = sorted(
        (int(s), int(c)) for s, c in zip(ls[ca < 0], lc[ca < 0]) if c > 0
    )
    got = []
    w_cap = tables.wcode_rows * 128 // 4
    for p in range(tables.num_pages):
        codes = pwcode[
            p * tables.wcode_rows : (p + 1) * tables.wcode_rows
        ].ravel()
        tri0 = int(page_tab[p, 1])
        for c in codes:
            if c >= 0:
                assert c < w_cap  # page-local wide id in capacity
            elif c != -1:
                packed = -int(c) - 1
                start, cnt = packed >> 10, packed & 1023
                if cnt > 0:
                    got.append((start + tri0, cnt))  # rebased global
    assert sorted(got) == want


def test_paged_wide_matches_resident_kernel():
    """Tiny pages force many portals + wide subtrees; hits bit-match
    the resident linear kernel (same f32 ops; this scene has no
    order-dependent exact-t ties, test_wide4.py relies on the same)."""
    arrays, cam = _two_instance_scene()
    o, d = _rays(cam)
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    got = cast_rays_paged_wide(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.inst), np.asarray(ref.inst))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_paged_wide_matches_binary_paged(monkeypatch):
    """The wide and binary in-page loops agree bit-for-bit; the
    TRT_PAGED_WIDE=0 escape hatch forces the binary loop."""
    arrays, cam = _two_instance_scene()
    o, d = _rays(cam)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    got = cast_rays_paged(arrays, tables, o, d, interpret=True)

    monkeypatch.setenv("TRT_PAGED_WIDE", "0")
    ref = cast_rays_paged(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_paged_wide_uniform_origin():
    arrays, cam = _two_instance_scene()
    o, d = _rays(cam)
    o3 = np.asarray(o).reshape(-1, 3)[0] if np.asarray(o).ndim > 1 \
        else np.asarray(o)
    ref = cast_rays_pallas(arrays, o3, d, interpret=True)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    got = cast_rays_paged_wide(arrays, tables, o3, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
