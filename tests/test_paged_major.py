"""Page-major paged kernel (kernels/paged_major.py) in the CPU suite.

The page-major kernel inverts the paged loop: grid over PAGES (each
DMA'd once per frame), all tiles' ray state resident. These tests pin
bit-equality with the resident linear kernel on a single-instance
scene forced into many tiny pages, for uniform and per-ray origins,
through the chunked path, and via the TRT_PAGED_MAJOR routing flag.
"""

import numpy as np
import pytest

from tpu_raytracer.kernels import paged_major
from tpu_raytracer.kernels.paged import cast_rays_paged, prepare_paged
from tpu_raytracer.kernels.paged_major import cast_rays_paged_major
from tpu_raytracer.kernels.traversal import cast_rays_pallas
from tpu_raytracer.render.camera import Camera, generate_rays

from test_render import sphere_scene


@pytest.fixture(autouse=True)
def _linear_reference(monkeypatch):
    monkeypatch.setenv("TRT_TLAS", "0")
    monkeypatch.setenv("TRT_DUAL", "0")


def _scene_and_rays(w=128, h=128):
    arrays, _ = sphere_scene(subdiv=3)  # 1280 tris, ONE instance
    cam = Camera.looking(w, h, fov_deg=40.0, pose=[0.2, -3.5, 0.1, 0, 0, 0])
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    return arrays, o, d


def test_paged_major_matches_resident_uniform():
    """Tiny pages + a multi-tile frame: page-major hits bit-match the
    resident linear kernel (uniform-origin primary rays)."""
    arrays, o, d = _scene_and_rays()
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    got = cast_rays_paged_major(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.inst), np.asarray(ref.inst))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_paged_major_general_origins():
    """Per-ray origins (the secondary-cast shape) through the resident
    state path."""
    arrays, o, d = _scene_and_rays(w=64, h=64)
    d = np.asarray(d)
    o = np.asarray(o) + 0.05 * d  # per-ray origins, same visibility class
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    got = cast_rays_paged_major(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_paged_major_chunked(monkeypatch):
    """Frames above the VMEM tile cap split into chunks; results are
    identical to the unchunked sweep."""
    arrays, o, d = _scene_and_rays()
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    ref = cast_rays_paged_major(arrays, tables, o, d, interpret=True)
    monkeypatch.setattr(paged_major, "MAX_MAJOR_TILES", 2)
    got = cast_rays_paged_major(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_paged_major_routing(monkeypatch):
    """TRT_PAGED_MAJOR=1 routes single-instance scenes through the
    page-major kernel from the standard cast_rays_paged entry."""
    arrays, o, d = _scene_and_rays(w=64, h=64)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    ref = cast_rays_paged(arrays, tables, o, d, interpret=True)
    monkeypatch.setenv("TRT_PAGED_MAJOR", "1")
    got = cast_rays_paged(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def _multi_instance_rays():
    """Two MESHES x two posed/scaled instances (cube + icosphere,
    test_pallas_interpret's scene): exercises the (instance, page) item
    sweep, page->mesh ownership masking, and the inst state block."""
    from test_pallas_interpret import _two_instance_scene

    arrays, cam = _two_instance_scene()
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    return arrays, o, d


def test_paged_major_multi_instance_matches_resident():
    """Multi-instance page-major (VERDICT r3 weak #4): bit-equal hits
    INCLUDING the instance id vs the resident linear kernel."""
    arrays, o, d = _multi_instance_rays()
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    got = cast_rays_paged_major(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.inst), np.asarray(ref.inst))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_paged_major_multi_instance_dma_is_o_items(monkeypatch):
    """The page DMA count is O(instances x visible pages), bounded by
    the I x P item grid — the stats counter records how many items
    actually streamed (ownership masking skips the rest)."""
    monkeypatch.setenv("TRT_KERNEL_STATS", "1")
    arrays, o, d = _multi_instance_rays()
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    from tpu_raytracer.kernels.paged import _PAGED_STATS

    cast_rays_paged_major(arrays, tables, o, d, interpret=True)
    streamed = int(_PAGED_STATS["pages_streamed"])
    n_items = arrays.num_instances * tables.num_pages
    assert 0 < streamed <= n_items
    # ownership masking: every mesh's pages stream for AT MOST the
    # instances that reference that mesh (here 1 each), so the total
    # can never reach the full I x P grid
    assert streamed < n_items
