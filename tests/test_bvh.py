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


# ---- sweep-SAH quality mode (mode="sweep", beyond-reference) ----


def test_sweep_invariants():
    v0, v1, v2 = _mesh_arrays(subdiv=3)
    bvh = build_bvh(v0, v1, v2, mode="sweep")
    # permutation
    assert sorted(bvh.order.tolist()) == list(range(len(v0)))
    # leaf ranges partition [0, T)
    is_leaf = bvh.child_a < 0
    starts = bvh.leaf_start[is_leaf]
    counts = bvh.leaf_count[is_leaf]
    order = np.argsort(starts)
    starts, counts = starts[order], counts[order]
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], starts[:-1] + counts[:-1])
    assert starts[-1] + counts[-1] == len(v0)
    # children inside parents
    internal = np.nonzero(bvh.child_a >= 0)[0]
    for i in internal:
        for c in (bvh.child_a[i], bvh.child_b[i]):
            assert (bvh.node_min[c] >= bvh.node_min[i] - 1e-6).all()
            assert (bvh.node_max[c] <= bvh.node_max[i] + 1e-6).all()


def test_sweep_cost_not_worse():
    from tpu_raytracer.accel.bvh import sah_cost

    v0, v1, v2 = _mesh_arrays(subdiv=3)
    ref = build_bvh(v0, v1, v2, min_leaf_size=16)
    sw = build_bvh(v0, v1, v2, min_leaf_size=16, mode="sweep")
    # the exact sweep considers a superset of split positions under the
    # same cost model; the greedy tree cost may not dominate node-by-node
    # but in practice stays at or below the 5-candidate tree (measured:
    # bunny -6%, colonnade -37%). Allow 2% slack for greedy noise.
    assert sah_cost(sw) <= sah_cost(ref) * 1.02


def test_sweep_render_matches_brute():
    """A sweep-built tree changes visit order, never hits: BVH-walk
    render equals the all-triangles brute render bit-for-bit."""
    import jax.numpy as jnp

    from tpu_raytracer.render import Camera, RenderConfig, render_image
    from tpu_raytracer.scene import Material, MeshInstance, MeshPrimitive, Scene

    v0, v1, v2 = _mesh_arrays(subdiv=2)
    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
    scene.add_mesh(
        MeshPrimitive.from_triangles(v0, v1, v2, builder="sweep")
    )
    scene.add_mesh_instance(MeshInstance(0, 0))
    arrays = scene.compile()
    cam = Camera.looking(64, 64, fov_deg=50.0, pose=[0, -3.2, 0.13, 0, 0, 0])
    p = cam.ray_params()
    imgs = {}
    for backend in ("brute", "bvh"):
        cfg = RenderConfig(cam.width, cam.height, backend=backend)
        imgs[backend] = render_image(
            cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]
        )
    assert jnp.array_equal(imgs["brute"], imgs["bvh"])
