"""HBM-paged traversal (kernels/paged.py) in the CPU suite.

Forces tiny page cuts on a small multi-instance scene so the partition
produces many pages and the kernel's portal + DMA + in-page traversal
paths all execute (interpret mode). Hit results must be bit-identical
to the resident pallas kernel (same f32 ops in the same order) and the
brute-force oracle images must match.
"""

import numpy as np
import pytest

from tpu_raytracer.accel.paging import build_page_table
from tpu_raytracer.kernels.paged import cast_rays_paged, prepare_paged
from tpu_raytracer.kernels.traversal import cast_rays_pallas
from tpu_raytracer.render.camera import generate_rays

from test_pallas_interpret import _two_instance_scene


@pytest.fixture(autouse=True)
def _linear_kernel(monkeypatch):
    # These tests pin BIT-exact equality between the paged and resident
    # LINEAR kernels; the TLAS variant matches only to ~2 ulps of t
    # (cross-program FMA contraction; test_tlas.py has its own oracle).
    monkeypatch.setenv("TRT_TLAS", "0")


def _rays(cam):
    p = cam.ray_params()
    return generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])


def test_page_table_invariants():
    arrays, _ = _two_instance_scene()
    pt = build_page_table(
        np.asarray(arrays.node_min), np.asarray(arrays.node_max),
        np.asarray(arrays.node_child_a), np.asarray(arrays.node_child_b),
        np.asarray(arrays.node_leaf_start), np.asarray(arrays.node_leaf_count),
        np.asarray(arrays.mesh_root),
        page_tris=32, page_nodes=64,
    )
    assert pt.num_pages > 2, "tiny cuts should force several pages"
    # portals ascend in node order and tri starts ascend with them
    assert (np.diff(pt.page_node0) > 0).all()
    # every instance root resolves to a valid top rank
    assert (pt.top_root >= 0).all()
    assert (pt.top_root < pt.num_top_nodes).all()
    # portal codes reference valid pages; internal codes valid ranks
    codes = pt.top_code
    portals = codes < 0
    assert ((-codes[portals] - 1) < pt.num_pages).all()
    assert (codes[~portals] < pt.num_top_nodes).all()


def test_paged_matches_resident_kernel():
    arrays, cam = _two_instance_scene()
    o, d = _rays(cam)
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64)
    got = cast_rays_paged(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.inst), np.asarray(ref.inst))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_paged_default_capacity_single_page_per_mesh():
    # default capacities swallow each tiny mesh whole: still correct
    arrays, cam = _two_instance_scene()
    o, d = _rays(cam)
    ref = cast_rays_pallas(arrays, o, d, interpret=True)
    tables = prepare_paged(arrays)
    got = cast_rays_paged(arrays, tables, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_auto_routing_beyond_budget(monkeypatch):
    """cast_rays_pallas routes beyond-VMEM scenes to the paged kernel
    automatically (VERDICT r2 item 2) — no silent XLA-walk fallback."""
    import jax

    import tpu_raytracer.kernels.traversal as trav

    arrays, cam = _two_instance_scene()
    o, d = _rays(cam)
    ref = cast_rays_pallas(arrays, o, d, interpret=True)

    monkeypatch.setattr(trav, "VMEM_SCENE_BUDGET", 0)
    # eager call with no tables: builds them on the spot
    got = trav.cast_rays_pallas(arrays, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))

    # with tables attached, the routing works inside jit too. Compare
    # against the jitted RESIDENT kernel (same compile regime: XLA
    # fuses the per-instance transform math differently under jit than
    # eager — ulp-level t shifts on a handful of edge-tie rays).
    paged_arrays = arrays.with_paging()
    assert paged_arrays.paged is not None

    @jax.jit
    def jitted(s):
        return trav.cast_rays_pallas(s, o, d, interpret=True)

    got2 = jitted(paged_arrays)
    monkeypatch.undo()  # restore the budget: resident path for ref2
    ref2 = jax.jit(
        lambda s: trav.cast_rays_pallas(s, o, d, interpret=True)
    )(arrays)
    np.testing.assert_array_equal(np.asarray(got2.t), np.asarray(ref2.t))
    np.testing.assert_array_equal(np.asarray(got2.tri), np.asarray(ref2.tri))
    monkeypatch.setattr(trav, "VMEM_SCENE_BUDGET", 0)

    # inside jit WITHOUT tables: loud error, not a silent slow path
    import pytest

    with pytest.raises(ValueError, match="with_paging"):
        jax.jit(lambda s: trav.cast_rays_pallas(s, o, d, interpret=True))(
            arrays
        )


def test_paged_backend_whitted_mode():
    """--backend paged now works for secondary-ray modes too: whitted
    through the public pipeline matches the bvh backend bit-for-bit."""
    from tpu_raytracer.render import RenderConfig
    from tpu_raytracer.render.pipeline import render_image_whitted

    arrays, cam = _two_instance_scene()
    p = cam.ray_params()
    args = (arrays.with_paging(), p["K_inv"], p["D"], p["pose"],
            p["inv_pose"])
    cfg = lambda b: RenderConfig(width=cam.width, height=cam.height,
                                 backend=b)
    a = np.asarray(render_image_whitted(cfg("paged"), *args, 1))
    b = np.asarray(render_image_whitted(cfg("bvh"), *args, 1))
    assert (a == b).all(), f"{(a != b).any(-1).sum()} pixels differ"
