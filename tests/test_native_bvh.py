"""Native C++ BVH builder vs numpy builder: bit-identical trees."""

import numpy as np
import pytest

from tpu_raytracer.accel.bvh import build_bvh
from tpu_raytracer.accel.native import build_bvh_native, native_available
from tpu_raytracer.scene import procgen

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native builder unavailable"
)

FIELDS = ["node_min", "node_max", "child_a", "child_b",
          "leaf_start", "leaf_count", "order"]


@pytest.mark.parametrize("subdiv", [2, 4])
def test_native_matches_numpy_exactly(subdiv):
    v0, v1, v2 = procgen.blob(subdiv)
    a = build_bvh(v0, v1, v2)
    b = build_bvh_native(v0, v1, v2)
    assert a.num_nodes == b.num_nodes
    for f in FIELDS:
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )


def test_native_single_triangle():
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    b = build_bvh_native(v0, v1, v2)
    assert b.num_nodes == 1
    assert b.child_a[0] == -1
    assert b.leaf_count[0] == 1


def test_native_respects_max_depth():
    v0, v1, v2 = procgen.icosphere(3)
    b = build_bvh_native(v0, v1, v2, max_depth=6)
    assert b.stats()["max_depth"] <= 6


def test_native_sweep_bit_identical():
    """mode="sweep" must match the numpy sweep builder exactly (same
    contract as the reference-mode bit-identity above)."""
    v0, v1, v2 = procgen.colonnade(3, 3, 12)
    a = build_bvh(v0, v1, v2, min_leaf_size=16, mode="sweep")
    b = build_bvh_native(v0, v1, v2, min_leaf_size=16, mode="sweep")
    for f in FIELDS:
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )
