"""BVH builder invariant tests (SURVEY.md §4 item 3)."""

import numpy as np

from tpu_raytracer.accel.bvh import build_bvh
from tpu_raytracer.scene import procgen


def _mesh_arrays(subdiv=2, seed=3):
    v0, v1, v2 = procgen.icosphere(subdiv)
    rng = np.random.default_rng(seed)
    jitter = rng.normal(0, 0.01, v0.shape).astype(np.float32)
    return v0 + jitter, v1, v2


def test_order_is_permutation():
    v0, v1, v2 = _mesh_arrays()
    bvh = build_bvh(v0, v1, v2)
    assert sorted(bvh.order.tolist()) == list(range(len(v0)))


def test_leaves_partition_triangles():
    v0, v1, v2 = _mesh_arrays()
    bvh = build_bvh(v0, v1, v2)
    is_leaf = bvh.child_a < 0
    starts = bvh.leaf_start[is_leaf]
    counts = bvh.leaf_count[is_leaf]
    # leaf ranges are disjoint and cover [0, T)
    order = np.argsort(starts)
    starts, counts = starts[order], counts[order]
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], starts[:-1] + counts[:-1])
    assert starts[-1] + counts[-1] == len(v0)
    assert counts.min() >= 1


def test_child_boxes_inside_parent():
    v0, v1, v2 = _mesh_arrays()
    bvh = build_bvh(v0, v1, v2)
    internal = np.nonzero(bvh.child_a >= 0)[0]
    for i in internal:
        for c in (bvh.child_a[i], bvh.child_b[i]):
            assert (bvh.node_min[c] >= bvh.node_min[i] - 1e-6).all()
            assert (bvh.node_max[c] <= bvh.node_max[i] + 1e-6).all()


def test_leaf_boxes_contain_triangles():
    v0, v1, v2 = _mesh_arrays()
    bvh = build_bvh(v0, v1, v2)
    p = bvh.order
    tv0, tv1, tv2 = v0[p], v1[p], v2[p]
    tmin = np.minimum(np.minimum(tv0, tv1), tv2)
    tmax = np.maximum(np.maximum(tv0, tv1), tv2)
    is_leaf = bvh.child_a < 0
    for i in np.nonzero(is_leaf)[0]:
        s, c = bvh.leaf_start[i], bvh.leaf_count[i]
        assert (tmin[s : s + c] >= bvh.node_min[i] - 1e-6).all()
        assert (tmax[s : s + c] <= bvh.node_max[i] + 1e-6).all()


def test_root_is_node_zero_and_depth_bound():
    v0, v1, v2 = _mesh_arrays(subdiv=3)
    bvh = build_bvh(v0, v1, v2, max_depth=8)
    stats = bvh.stats()
    assert stats["max_depth"] <= 8
    # node 0 is the root: nothing points at it
    assert 0 not in set(bvh.child_a.tolist()) | set(bvh.child_b.tolist())


def test_single_triangle_and_empty():
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    bvh = build_bvh(v0, v1, v2)
    assert bvh.num_nodes == 1
    assert bvh.child_a[0] == -1
    assert bvh.leaf_count[0] == 1


def test_splits_reduce_counts():
    v0, v1, v2 = _mesh_arrays(subdiv=3)
    bvh = build_bvh(v0, v1, v2)
    s = bvh.stats()
    assert s["num_leaves"] > 10
    assert s["avg_triangles_per_leaf"] < 16
