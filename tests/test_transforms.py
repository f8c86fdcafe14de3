"""Property/round-trip tests for the transform stack — the asserted
version of the reference's manual test_all (transforms.hpp:243-298)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracer.core import transforms as T
from tpu_raytracer.core import vecmath as V

RNG = np.random.default_rng(0)


def rand_pose(n=()):
    xyz = RNG.uniform(-10, 10, n + (3,))
    euler = RNG.uniform(-1.2, 1.2, n + (3,))  # stay clear of gimbal lock
    return jnp.asarray(np.concatenate([xyz, euler], -1), jnp.float32)


def rand_vec(n=()):
    return jnp.asarray(RNG.uniform(-5, 5, n + (3,)), jnp.float32)


def test_quat_path_matches_rotmat_path():
    # apply_euler (runtime path, transforms.hpp:219-221) must agree with
    # euler2rotmat (lre2homo path, transforms.hpp:129-144).
    e = rand_pose((64,))[..., 3:6]
    v = rand_vec((64,))
    via_quat = T.apply_euler(e, v)
    via_mat = V.apply_mat3(T.euler2rotmat(e), v)
    np.testing.assert_allclose(via_quat, via_mat, atol=1e-5)


def test_euler_rotmat_roundtrip():
    e = rand_pose((64,))[..., 3:6]
    e2 = T.rotmat2euler(T.euler2rotmat(e))
    np.testing.assert_allclose(e, e2, atol=1e-5)


def test_lre_homo_roundtrip():
    p = rand_pose((32,))
    p2 = T.homo2lre(T.lre2homo(p))
    np.testing.assert_allclose(p, p2, atol=1e-4)


def test_apply_lre_matches_homo():
    p = rand_pose((32,))
    v = rand_vec((32,))
    H = T.lre2homo(p)
    vh = jnp.concatenate([v, jnp.ones(v.shape[:-1] + (1,), jnp.float32)], -1)
    expected = jnp.einsum("...ij,...j->...i", H, vh, precision="highest")[..., :3]
    got = T.apply_lre(p, v)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_invert_lre_roundtrips_points():
    p = rand_pose((32,))
    v = rand_vec((32,))
    local = T.apply_lre(p, v)
    back = T.apply_lre(T.invert_lre(p), local)
    np.testing.assert_allclose(back, v, atol=1e-3)


def test_compose_lre():
    p1, p2 = rand_pose((16,)), rand_pose((16,))
    v = rand_vec((16,))
    # compose_homo(H1, H2) = H2 @ H1: applying the composite equals
    # applying p1 then p2 (transforms.hpp:113-116, 228-230).
    comp = T.compose_lre(p1, p2)
    np.testing.assert_allclose(
        T.apply_lre(comp, v), T.apply_lre(p2, T.apply_lre(p1, v)), atol=1e-3
    )


def test_invert_homo():
    p = rand_pose((16,))
    H = T.lre2homo(p)
    ident = jnp.matmul(T.invert_homo(H), H, precision="highest")
    np.testing.assert_allclose(
        ident, jnp.broadcast_to(jnp.eye(4), ident.shape), atol=1e-5
    )


def test_invert_intrinsic():
    K = jnp.array(
        [[862.0978, 0.0, 998.1702], [0.0, 862.1368, 569.6759], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    np.testing.assert_allclose(
        V.invert_intrinsic(K) @ K, jnp.eye(3), atol=1e-5
    )


def test_q_rsqrt_matches_reference_algorithm():
    # Bit-exact check of the Quake rsqrt against a numpy reimplementation
    # (utils.hpp:12-27).
    x = np.abs(RNG.uniform(0.01, 100, (256,))).astype(np.float32)
    i = x.view(np.int32)
    i2 = np.int32(0x5F3759DF) - (i >> 1)
    y = i2.view(np.float32)
    expected = y * (np.float32(1.5) - x * np.float32(0.5) * y * y)
    got = np.asarray(V.q_rsqrt(jnp.asarray(x)))
    np.testing.assert_array_equal(got, expected)
    # and it's a decent approximation
    np.testing.assert_allclose(got, 1.0 / np.sqrt(x), rtol=2e-3)


def test_normalize():
    v = rand_vec((64,))
    n = T.apply_euler(jnp.zeros(3), V.normalize(v))  # passthrough sanity
    np.testing.assert_allclose(V.magnitude(n), 1.0, atol=1e-5)
    napprox = V.normalize(v, exact=False)
    np.testing.assert_allclose(V.magnitude(napprox), 1.0, atol=5e-3)


def test_cross_dot():
    a, b = rand_vec((32,)), rand_vec((32,))
    c = V.cross(a, b)
    np.testing.assert_allclose(V.dot(c, a), 0.0, atol=1e-3)
    np.testing.assert_allclose(V.dot(c, b), 0.0, atol=1e-3)
    np.testing.assert_allclose(V.dot(a, b), np.sum(np.asarray(a) * np.asarray(b), -1), rtol=1e-5)
