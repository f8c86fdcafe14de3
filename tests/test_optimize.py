"""Reinsertion BVH optimizer (accel/optimize.py): structural
invariants, monotone SAH, and render equivalence through the real
kernels (the optimized tree must be a drop-in replacement)."""

import numpy as np

from tpu_raytracer.accel.bvh import build_bvh, sah_cost
from tpu_raytracer.accel.optimize import optimize_bvh
from tpu_raytracer.scene import procgen


def _tree(subdiv=3, mode="sweep"):
    v0, v1, v2 = procgen.blob(subdivisions=subdiv)
    return (v0, v1, v2), build_bvh(v0, v1, v2, min_leaf_size=16, mode=mode)


def _check_invariants(bvh, num_tris):
    # order is a permutation
    assert sorted(bvh.order.tolist()) == list(range(num_tris))
    # leaf ranges partition [0, T) and ascend in DFS leaf order (the
    # paging/wide layout contract)
    is_leaf = bvh.child_a < 0
    idx = np.nonzero(is_leaf)[0]  # ascending node id == DFS leaf order
    starts = bvh.leaf_start[idx]
    counts = bvh.leaf_count[idx]
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], starts[:-1] + counts[:-1])
    assert starts[-1] + counts[-1] == num_tris
    # DFS preorder: child_a == parent + 1 everywhere
    internal = np.nonzero(~is_leaf)[0]
    np.testing.assert_array_equal(bvh.child_a[internal], internal + 1)
    # children boxes inside parents
    for i in internal:
        for c in (bvh.child_a[i], bvh.child_b[i]):
            assert (bvh.node_min[c] >= bvh.node_min[i] - 1e-6).all()
            assert (bvh.node_max[c] <= bvh.node_max[i] + 1e-6).all()
    # root is node 0
    assert 0 not in set(bvh.child_a.tolist()) | set(bvh.child_b.tolist())


def test_optimize_invariants_and_monotone_sah():
    (v0, _, _), bvh = _tree(subdiv=4)
    opt = optimize_bvh(bvh, rounds=2)
    _check_invariants(opt, len(v0))
    assert sah_cost(opt) <= sah_cost(bvh) * (1 + 1e-6)


def test_optimize_improves_nonuniform_scene():
    v0, v1, v2 = procgen.colonnade(3, 3, 8)
    bvh = build_bvh(v0, v1, v2, min_leaf_size=16, mode="sweep")
    opt = optimize_bvh(bvh, rounds=2)
    _check_invariants(opt, len(v0))
    assert sah_cost(opt) < sah_cost(bvh)


def test_optimize_respects_depth_cap():
    (v0, _, _), bvh = _tree(subdiv=4)
    cap = bvh.stats()["max_depth"] + 3
    opt = optimize_bvh(bvh, rounds=3, max_depth=cap)
    assert opt.stats()["max_depth"] <= cap


def test_optimized_tree_renders_identically_to_brute():
    """End-to-end: a scene whose mesh carries an optimized tree must
    brute-oracle-match through the XLA walk (tree changes visit order;
    the blob has no shared-edge exact t-ties from this camera)."""
    import jax.numpy as jnp

    from tpu_raytracer.render import Camera, RenderConfig
    from tpu_raytracer.render.pipeline import render_image
    from tpu_raytracer.scene import Material, MeshInstance, MeshPrimitive, Scene

    def build(opt_rounds):
        import os

        scene = Scene()
        scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
        v0, v1, v2 = procgen.blob(subdivisions=3)
        prev = os.environ.get("TRT_BVH_OPT")
        os.environ["TRT_BVH_OPT"] = str(opt_rounds)
        try:
            scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2))
        finally:
            if prev is None:
                os.environ.pop("TRT_BVH_OPT")
            else:
                os.environ["TRT_BVH_OPT"] = prev
        scene.add_mesh_instance(MeshInstance(0, 0))
        return scene.compile()

    cam = Camera.looking(64, 64, fov_deg=50.0, pose=[0.0, -3.2, 0.13, 0, 0, 0])
    p = cam.ray_params()

    imgs = {}
    for rounds, backend in ((0, "brute"), (2, "bvh")):
        arrays = build(rounds)
        cfg = RenderConfig(cam.width, cam.height, backend=backend)
        imgs[rounds] = np.asarray(render_image(
            cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]))
    np.testing.assert_array_equal(imgs[2], imgs[0])
