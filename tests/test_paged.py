"""HBM-paged traversal (kernels/paged.py) in the CPU suite.

Forces tiny page cuts on a small multi-instance scene so the partition
produces many pages and the kernel's portal + DMA + in-page traversal
paths all execute (interpret mode). Hit results must be bit-identical
to the resident pallas kernel (same f32 ops in the same order) and the
brute-force oracle images must match.
"""

import numpy as np

from tpu_raytracer.accel.paging import build_page_table
from tpu_raytracer.kernels.paged import cast_rays_paged, prepare_paged
from tpu_raytracer.kernels.traversal import cast_rays_pallas
from tpu_raytracer.render.camera import generate_rays

from test_pallas_interpret import _two_instance_scene


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
