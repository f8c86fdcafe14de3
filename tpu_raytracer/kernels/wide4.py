"""4-wide BVH packet traversal (flagship experiment v16).

Pops are the serial currency of the packet kernel: each pop sync costs
a vector->SMEM->scalar round-trip (~600 cycles) that Mosaic cannot hide
(PERF_LOG r2 anatomy). A 4-wide node covers three binary internal
nodes, so the wide tree needs ~3x fewer pops for ~1.3x the vector work
per pop — and the four children are SIBLINGS ranked near-first within
one sync, so unlike raising POP_K the descent order does NOT go stale
(the failure mode that capped POP_K at 2, r2 colonnade A/B).

Encoding (accel/wide.py collapse4):
  * one 32-lane record per wide node (4 per 128-lane row): rows
    c*6 .. c*6+5 are child c's box (min xyz, max xyz), absent children
    carry inverted boxes that never pass a slab test;
  * wcode[4*w + c]: internal -> wide child id; leaf ->
    -(start*1024+count)-1; absent -> -1. No implicit-child rule: all
    four ids are explicit, read scalar-direct from SMEM.

Per pop, the vector phase computes the four child entry distances and
packs ONE sync word: hit count (3 bits) + the near-first child
permutation (2 bits x 4). The scalar phase walks the permutation
farthest-first pushing internal children and collects leaf children
nearest-first for immediate dense testing. Leaf tests are unchanged.

The r1 8-wide failure (0.9-2.3 Mrays/s) was at 128-ray packets where
pops do not amortize; the scheme is built for the 4096-ray regime.

This module now holds the TABLES + encoding constants only. The
standalone single-tile wide kernel that prototyped the scheme
(145 -> 161 Mrays/s, PERF_LOG r3) was superseded by its consumers and
deleted (VERDICT r3 weak #8): the dual-wide flagship (kernels/dual.py,
which also covers the single-tile case at TRT_DUAL_WAVES=1), the TLAS
BLAS loop (kernels/tlas.py), and the paged in-page traverser
(kernels/paged_wide.py) all pop these records.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.scene import SceneArrays
from .traversal import LEAF_BITS, MAX_LEAF_TRIS, NUDGE, TILE_L

REC32 = 32  # lanes per wide-node record, 4 records per 128-lane row
REC32_PER_ROW = TILE_L // REC32

# Wide pops per scalar sync. Each pop already covers ~2 binary pops'
# worth of tree, so K=2 syncs as much tree as binary POP_K=4 would —
# without the stale-descent-order cost (children rank within the pop).
POP_KW = int(os.environ.get("TRT_WIDE_POPK", "2"))

# Wide stack: a 4-wide pop pushes up to 4 children (net +3 per level
# vs the binary kernel's +1), so the front can reach ~3x the wide
# depth; 192 slots cover deep scenes with slack (the binary kernel's
# 64 is NOT enough — overflow faults the chip, observed r3 dual-wide).
STACK_W = 192
_S_PUSH = STACK_W  # + POP_KW sync words
_SMEM_SLOTS = STACK_W + POP_KW


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Wide4Tables:
    """Device tables for the 4-wide kernel (rides SceneArrays.wide4)."""

    wcode: jax.Array  # [4*W] i32 (SMEM)
    wnodef: jax.Array  # [ceil(W/4), 128] f32 32-lane records
    wroot: jax.Array  # [M] i32
    # Largest leaf triangle count in the tree (STATIC: lets the kernel
    # replace the per-leaf dynamic fori_loop with one straight-line
    # LEAF_U-triangle block when max_leaf <= LEAF_U).
    max_leaf: int = dataclasses.field(
        default=MAX_LEAF_TRIS, metadata=dict(static=True)
    )


def build_wide4(scene: SceneArrays) -> Wide4Tables:
    """Eager host build: collapse the binary BVH and pack records."""
    from ..accel.wide import collapse4

    w = collapse4(
        np.asarray(scene.node_child_a),
        np.asarray(scene.node_child_b),
        np.asarray(scene.node_leaf_start),
        np.asarray(scene.node_leaf_count),
        np.asarray(scene.node_min),
        np.asarray(scene.node_max),
        np.asarray(scene.mesh_root),
    )
    n = w.num_nodes
    # 32-lane records: child c's box at rows c*6..c*6+5, NUDGE baked
    # (absent children stay inverted: BIG -NUDGE is still BIG-ish)
    fields = []
    for c in range(4):
        mn = w.wbox_min[:, c] - np.float32(NUDGE)
        mx = w.wbox_max[:, c] + np.float32(NUDGE)
        fields += [mn[:, 0], mn[:, 1], mn[:, 2], mx[:, 0], mx[:, 1], mx[:, 2]]
    rec = np.zeros((n, REC32), np.float32)
    for j, f in enumerate(fields):
        rec[:, j] = f
    pad = (-n) % REC32_PER_ROW + REC32_PER_ROW
    rec = np.concatenate([rec, np.zeros((pad, REC32), np.float32)])
    is_leaf = np.asarray(scene.node_child_a) < 0
    counts = np.asarray(scene.node_leaf_count)[is_leaf]
    return Wide4Tables(
        wcode=jnp.asarray(w.wcode),
        wnodef=jnp.asarray(rec.reshape(-1, TILE_L)),
        wroot=jnp.asarray(w.wroot),
        max_leaf=int(counts.max()) if counts.size else 0,
    )
