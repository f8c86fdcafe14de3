"""Small-table row lookups without per-element gathers.

TPU XLA lowers ``table[idx]`` to a per-ELEMENT gather (~2.7 elements/
cycle, PERF_LOG r3) — the measured wall of textured and multi-instance
shading is exactly these lookups: per-ray rows from tables that are
only a handful of rows tall (materials, instances). An [M, W] table
gathered per ray per shade costs W elements/ray; the whitted frame
pays that for the [I, 18] instance-transform pack, the [M, 3] albedo
and texture-descriptor packs, and the [M, 2] reflectivity pack — at
every one of its 2*bounces+1 shades (the reference reads the same
records through cached device pointers, raycast.cu:32-45, 224-245,
where the cost is invisible; on TPU it is the frame wall).

For small M the same lookup is computable in dense vector/matrix form:

* float tables: a one-hot ``[N, M] x [M, W]`` contraction — MXU work
  instead of scatter/gather traffic. Bit-exact vs the gather: each
  one-hot row holds a single 1.0, so the reduction adds W-1 exact
  zeros to 1.0*x (the only caveat is x == -0.0, which the sum
  canonicalizes to +0.0; scene tables never carry signed zeros that
  matter — and equality tests treat them as equal anyway).
* integer tables: an M-step select chain, preserving i32 width
  end-to-end (texture atlas offsets may exceed 2^24 and must not
  round through f32 — shade.py surface_color's contract).

``TRT_TABLE_ONEHOT=0`` falls back to plain gathers everywhere (A/B
knob)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# tables taller than this keep the gather: the one-hot operand is
# [N, M] and the select chain is M passes — both scale linearly in M
# while the gather does not
MAX_ONEHOT_ROWS = 64


def _enabled() -> bool:
    return os.environ.get("TRT_TABLE_ONEHOT", "1") != "0"


def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for a small static [M, W] (or [M]) table.

    ``idx`` may have any shape; the result is idx.shape + table.shape
    [1:]. Requires every index in [0, M) (callers here clamp on miss
    lanes already). Falls back to the gather for tall tables, traced
    table heights, or when disabled by env."""
    table = jnp.asarray(table)
    m = table.shape[0]
    if (
        not _enabled()
        or not isinstance(m, int)
        or m > MAX_ONEHOT_ROWS
        or table.ndim > 2
    ):
        return table[idx]
    if m == 1:
        # single row: the lookup is a broadcast, no data movement
        return jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    if jnp.issubdtype(table.dtype, jnp.floating):
        onehot = (
            idx[..., None] == jnp.arange(m, dtype=idx.dtype)
        ).astype(table.dtype)
        t2 = table[:, None] if table.ndim == 1 else table
        # precision HIGHEST: the default matmul precision is bf16-class
        # even on CPU — exactness (1.0 * x) requires full f32
        out = jax.lax.dot_general(
            onehot, t2,
            dimension_numbers=(((onehot.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[..., 0] if table.ndim == 1 else out
    # integer/bool tables: select chain (no f32 round-trip)
    out = jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    for i in range(1, m):
        hit = idx == i
        if table.ndim == 2:
            hit = hit[..., None]
        out = jnp.where(hit, table[i], out)
    return out
