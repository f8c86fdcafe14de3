"""core/tables.take_rows: gather-free small-table lookups must be
BIT-IDENTICAL to the plain gather (the shading paths assert image
equality against goldens built on gathers)."""

import numpy as np
import jax.numpy as jnp

from tpu_raytracer.core.tables import MAX_ONEHOT_ROWS, take_rows


def test_float_table_matches_gather():
    rng = np.random.default_rng(3)
    table = rng.standard_normal((7, 18)).astype(np.float32)
    idx = rng.integers(0, 7, size=(33, 41)).astype(np.int32)
    out = np.asarray(take_rows(jnp.asarray(table), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, table[idx])


def test_int_table_matches_gather_and_keeps_width():
    # values past 2^24: must NOT round through f32 (atlas offsets)
    table = np.array(
        [[1 << 25, 3, 4], [(1 << 26) + 1, 5, 6], [7, 8, 9]], np.int32
    )
    idx = np.array([[2, 0], [1, 1]], np.int32)
    out = take_rows(jnp.asarray(table), jnp.asarray(idx))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_1d_tables():
    tf = np.array([0.5, -1.25, 3.75], np.float32)
    ti = np.array([10, 20, 30], np.int32)
    idx = np.array([2, 1, 0, 1], np.int32)
    np.testing.assert_array_equal(
        np.asarray(take_rows(jnp.asarray(tf), jnp.asarray(idx))), tf[idx]
    )
    np.testing.assert_array_equal(
        np.asarray(take_rows(jnp.asarray(ti), jnp.asarray(idx))), ti[idx]
    )


def test_single_row_broadcast():
    table = np.array([[1.5, 2.5]], np.float32)
    idx = np.zeros((4, 4), np.int32)
    out = np.asarray(take_rows(jnp.asarray(table), jnp.asarray(idx)))
    assert out.shape == (4, 4, 2)
    np.testing.assert_array_equal(out, np.broadcast_to(table[0], (4, 4, 2)))


def test_tall_table_falls_back_to_gather():
    rng = np.random.default_rng(5)
    table = rng.standard_normal((MAX_ONEHOT_ROWS + 1, 3)).astype(np.float32)
    idx = rng.integers(0, table.shape[0], size=17).astype(np.int32)
    out = np.asarray(take_rows(jnp.asarray(table), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, table[idx])


def test_env_disable(monkeypatch):
    monkeypatch.setenv("TRT_TABLE_ONEHOT", "0")
    table = np.arange(12, dtype=np.float32).reshape(4, 3)
    idx = np.array([3, 0], np.int32)
    np.testing.assert_array_equal(
        np.asarray(take_rows(jnp.asarray(table), jnp.asarray(idx))),
        table[idx],
    )


def test_under_jit_and_scalar_idx():
    import jax

    table = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
    f = jax.jit(lambda i: take_rows(table, i))
    np.testing.assert_array_equal(np.asarray(f(jnp.int32(2))), [4.0, 5.0])
