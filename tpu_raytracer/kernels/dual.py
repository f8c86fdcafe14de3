"""Dual-tile interleaved packet traversal (flagship experiment v15).

The resident packet kernel (kernels/traversal.py) is latency-bound:
~43 serial steps per 4096-ray tile at ~600 cycles each, most of it
vector->SMEM->scalar sync latency and serial fetch->reduce chains the
Mosaic scheduler cannot overlap WITHIN one traversal (r2 anatomy,
PERF_LOG.md). This variant traverses TWO independent ray tiles per grid
step with SEPARATE SMEM stacks and separate per-ray best states,
interleaving their pop phases:

  * ONE combined scalar stall consumes both tiles' 2xPOP_K sync words —
    4 node pops per sync at POP_K=2 — while each tile's descent order
    stays the proven per-tile POP_K=2 (the r2 A/B showed K>=3's stale
    order collapsing deep scenes; interleaving amortizes the sync
    WITHOUT adding staleness because the tiles are independent);
  * the two tiles' record fetches and box tests are independent
    dependency chains, so tile B's loads issue while tile A's masked
    reduce is still in flight (the r1 dual-wave failure shared one
    stack and one state, serializing the chains);
  * leaf loops run FUSED: one fori iteration tests an 8-triangle row
    for each tile (two independent load->test chains per iteration)
    bounded by the larger quad count.

The reference analog is unchanged (the per-thread stack walk,
raycast.cu:54-138); this is purely a deeper software-pipelining of the
same packet traversal. Hit results are bit-identical to the single-tile
kernel: each tile runs the exact same f32 ops in the same order.

A/B gate: TRT_DUAL=1 selects this kernel in cast_rays_pallas (TPU
only). Supports the uniform-origin specialization; the frustum/bf16/
batch-reduce experiments (all measured losses) are not carried over.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import SceneArrays
from .traversal import (
    BIG,
    EDGE_EPS,
    FMA_BOX,
    LEAF_BITS,
    LEAF_UNROLL,
    MAX_LEAF_TRIS,
    PARALLEL_EPS,
    PIX_H,
    PIX_W,
    POP_K,
    REC_LANES,
    REC_PER_ROW,
    SMEM_CODE_BUDGET,
    STACK_SIZE,
    TILE,
    TILE_L,
    TILE_S,
    _FLT_MAX,
    _hit_from_outs,
    _image_to_tiles,
    _quat_rot,
    _scene_kernel_inputs,
    _stats_enabled,
    _tiles_to_image,
    make_test_tri,
)

# Fused leaf loops (one fori iteration does both tiles' 8-tri rows,
# bounded by max(nA, nB)): measured a LOSS on TPU (130.4 vs 145
# Mrays/s) — uncorrelated leaf schedules make the overshoot waste
# exceed the overlap gain. Default 0 = separate per-tile leaf loops.
FUSED_LEAVES = os.environ.get("TRT_DUAL_FUSED", "0") == "1"

# Triangles per leaf-loop iteration (multiple of 8 = the packed row
# width). 16 loads TWO rows per iteration — independent load->test
# chains the scheduler can overlap, halving the serial leaf-iteration
# count at min_leaf 16 (most leaves fit one iteration). Default 16
# after the r3 sweep: 170.2 vs 158.0 Mrays/s at 8 on the 82k-tri
# flagship (32 overshoots: 123.3; min_leaf 8/24/32 with matched widths
# all land 162-166 — min_leaf 16 + LEAF_U 16 is the optimum).
LEAF_U = int(os.environ.get("TRT_LEAF_U", "16"))
assert LEAF_U % LEAF_UNROLL == 0

# Per-row best-hit accumulators inside the leaf loop (TRT_LEAF_ACC=1):
# each loaded row's 8 tests chain into a PRIVATE (t, tri, inst)
# accumulator, merged once per loop exit by lexicographic (t, k) min —
# bit-identical to the sequential chain (ties keep the smaller triangle
# index, exactly like the sequential strict `t < t_b` update) while
# cutting the cross-row serial dependency to one merge.
LEAF_ACC = os.environ.get("TRT_LEAF_ACC", "0") == "1"

# Fuse the two tiles' compacted leaf drains into one fori bounded by
# max(nlA, nlB) (TRT_DRAIN_FUSED=1). A/B knob, see leaf_drain_fused.
DRAIN_FUSED = os.environ.get("TRT_DRAIN_FUSED", "0") == "1"

# Software-pipelined wide pops (TRT_DUAL_PIPE=1): the NEXT sync's
# record fetches (dyn-sublane row load + masked broadcast extraction —
# the longest vector chain in the pop phase) issue right after the
# scalar phase commits the new stack tops, BEFORE the leaf drains; the
# records ride the while carry and the box tests run at the next body's
# start against the drain-updated t — the same t the unpipelined kernel
# uses, so traversal decisions and results are bit-identical.
PIPE = os.environ.get("TRT_DUAL_PIPE", "0") == "1"

# Pack the two tiles' j-th sync words into ONE SMEM word
# (TRT_PACK_WORDS=1): halves the vector->SMEM stores the scalar phase's
# combined stall waits on (wide words are 11 bits: 3-bit hit count +
# four 2-bit ranks; tile A in the low half, tile B << 16).
PACK_WORDS = os.environ.get("TRT_PACK_WORDS", "0") == "1"

# Tiles traversed per grid step (the "dual" in the kernel name is the
# default 2). Raising WAVES with a SMALLER packet (TRT_PIX_H/W) keeps
# the sync amortization of a big grid step while shrinking each
# traversal's node union — the lever VERDICT r3 called for on
# incoherent secondary casts: e.g. 32x32 packets (1024 rays, one vreg
# per VPU op) x 4 waves = the same 4096 rays/step as the flagship's
# 64x64 x 2, but four independent stacks whose unions don't pollute
# each other. Box/leaf tests also shrink to the (TILE_S, 128) slice.
WAVES = int(os.environ.get("TRT_DUAL_WAVES", "2"))
assert not (PACK_WORDS and WAVES != 2), "TRT_PACK_WORDS packs tile PAIRS"

# Per-tile stack size. Wide mode needs far more than the binary
# kernel's 64: a 4-wide pop pushes up to 4 children (net +3 per level,
# vs +1 binary) and POP_K=2 adds up to +6 transiently — an overflow
# lands in the NEIGHBORING tile's stack region and corrupts its node
# ids (negative leaf codes -> OOB record fetch -> chip fault; observed
# r3 on the first dual-wide TPU run).
def _stack_sz(wide: bool) -> int:
    return 192 if wide else STACK_SIZE


# SMEM layout: WAVES stacks | WAVES*POP_K code slots | WAVES*POP_K push
# words | (wide only) WAVES per-tile compacted leaf lists of 4*POP_K
# (start, count) pairs each.
def _smem_layout(wide: bool):
    s = _stack_sz(wide)
    leaf0 = WAVES * s + 2 * WAVES * POP_K
    total = leaf0 + (8 * WAVES * POP_K if wide else 0)
    return WAVES * s, WAVES * s + WAVES * POP_K, leaf0, total


def _dual_kernel(num_instances, with_stats, uniform_o, smem_codes,
                 tri_rows, wide, flat_leaf, occlusion, carry_uv,
                 carry_n, *refs):
    """``wide=True`` pops 4-wide collapsed nodes (accel/wide.py
    encoding: explicit child codes in SMEM, 32-lane box records) —
    combining the dual-tile sync sharing with the wide tree's ~3x
    lower pop count. Codes are always SMEM-resident in wide mode."""
    if uniform_o:
        (inst_tab_ref, inst_root_ref, worigin_ref,
         dx_ref, dy_ref, dz_ref, code_ref, nodef_ref, trif_ref) = refs[:9]
        rest = refs[9:]
        ox_ref = oy_ref = oz_ref = None
    else:
        (inst_tab_ref, inst_root_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         code_ref, nodef_ref, trif_ref) = refs[:11]
        rest = refs[11:]
    n_extra = (2 if carry_uv else 0) + (3 if carry_n else 0)
    extra_out_refs = ()
    if n_extra:
        extra_out_refs = rest[3:3 + n_extra]
        rest = rest[:3] + rest[3 + n_extra:]
    if with_stats:
        t_out_ref, tri_out_ref, inst_out_ref, pops_ref, tests_ref, smem_ref = rest
    else:
        t_out_ref, tri_out_ref, inst_out_ref, smem_ref = rest

    stack_sz = _stack_sz(wide)
    _s_code, _s_push, _s_leaf, _ = _smem_layout(wide)

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 0)

    def fetch_record(k):
        row = nodef_ref[pl.ds(k // REC_PER_ROW, 1), :]
        rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
        mask = lane16 == (k % REC_PER_ROW) * REC_LANES + sub16
        vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
        return vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)

    if wide:
        from .wide4 import REC32, REC32_PER_ROW

        lane32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 1)
        sub32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 0)

        def fetch32(k):
            row = nodef_ref[pl.ds(k // REC32_PER_ROW, 1), :]
            rep = jnp.broadcast_to(row, (REC32, TILE_L))
            mask = lane32 == (k % REC32_PER_ROW) * REC32 + sub32
            vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
            return vals + jnp.zeros((REC32, TILE_L), jnp.float32)

    # per-tile ray component tiles: [2][3] of [TILE_S, 128]
    dirs = [tuple(r[0, w] for r in (dx_ref, dy_ref, dz_ref))
            for w in range(WAVES)]
    if not uniform_o:
        origs = [tuple(r[0, w] for r in (ox_ref, oy_ref, oz_ref))
                 for w in range(WAVES)]
    def _fresh_state():
        st = (
            jnp.full((TILE_S, TILE_L), BIG, jnp.float32),
            jnp.full((TILE_S, TILE_L), -1, jnp.int32),
            jnp.full((TILE_S, TILE_L), -1, jnp.int32),
        )
        for _ in range(n_extra):
            st = st + (jnp.zeros((TILE_S, TILE_L), jnp.float32),)
        return st

    best = [_fresh_state() for _ in range(WAVES)]
    n_pops = jnp.int32(0)
    n_tests = jnp.int32(0)

    for i in range(num_instances):
        qw = inst_tab_ref[i, 0]
        qx = inst_tab_ref[i, 1]
        qy = inst_tab_ref[i, 2]
        qz = inst_tab_ref[i, 3]
        px = inst_tab_ref[i, 4]
        py = inst_tab_ref[i, 5]
        pz = inst_tab_ref[i, 6]
        sx = inst_tab_ref[i, 7]
        sy = inst_tab_ref[i, 8]
        sz = inst_tab_ref[i, 9]

        def _inv(v):
            tiny = 1e-30
            safe = jnp.where(jnp.abs(v) < tiny,
                             jnp.where(v < 0, -tiny, tiny), v)
            return 1.0 / safe

        # per-tile object-space rays (raycast.cu:32-51)
        od = []
        oo = []
        idv = []
        oi = []
        for w in range(WAVES):
            wdx, wdy, wdz = dirs[w]
            odx, ody, odz = _quat_rot(qw, qx, qy, qz, wdx, wdy, wdz)
            odx, ody, odz = odx * sx, ody * sy, odz * sz
            if uniform_o:
                if w == 0:
                    wox = worigin_ref[0]
                    woy = worigin_ref[1]
                    woz = worigin_ref[2]
                    s_oox, s_ooy, s_ooz = _quat_rot(
                        qw, qx, qy, qz, wox - px, woy - py, woz - pz
                    )
                    s_oox, s_ooy, s_ooz = s_oox * sx, s_ooy * sy, s_ooz * sz
                oox, ooy, ooz = s_oox, s_ooy, s_ooz
            else:
                wox, woy, woz = origs[w]
                oox, ooy, ooz = _quat_rot(
                    qw, qx, qy, qz, wox - px, woy - py, woz - pz
                )
                oox, ooy, ooz = oox * sx, ooy * sy, ooz * sz
            idx_, idy_, idz_ = _inv(odx), _inv(ody), _inv(odz)
            od.append((odx, ody, odz))
            oo.append((oox, ooy, ooz))
            idv.append((idx_, idy_, idz_))
            if FMA_BOX and not uniform_o:
                oi.append((oox * idx_, ooy * idy_, ooz * idz_))

        fma_box = FMA_BOX and not uniform_o

        def packet_entry(w, rec, base, t_cap):
            """Per-tile packet slab test — op-identical to the resident
            kernel's (traversal.py packet_entry)."""
            idx_, idy_, idz_ = idv[w]
            oox, ooy, ooz = oo[w]
            bminx = rec[base + 0 : base + 1, :]
            bminy = rec[base + 1 : base + 2, :]
            bminz = rec[base + 2 : base + 3, :]
            bmaxx = rec[base + 3 : base + 4, :]
            bmaxy = rec[base + 4 : base + 5, :]
            bmaxz = rec[base + 5 : base + 6, :]
            if fma_box:
                oix, oiy, oiz = oi[w]
                t1x = bminx * idx_ - oix
                t2x = bmaxx * idx_ - oix
                t1y = bminy * idy_ - oiy
                t2y = bmaxy * idy_ - oiy
                t1z = bminz * idz_ - oiz
                t2z = bmaxz * idz_ - oiz
            else:
                t1x = (bminx - oox) * idx_
                t2x = (bmaxx - oox) * idx_
                t1y = (bminy - ooy) * idy_
                t2y = (bmaxy - ooy) * idy_
                t1z = (bminz - ooz) * idz_
                t2z = (bmaxz - ooz) * idz_
            near = jnp.maximum(
                jnp.maximum(jnp.fmin(t1x, t2x), jnp.fmin(t1y, t2y)),
                jnp.fmin(t1z, t2z),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.fmax(t1x, t2x), jnp.fmax(t1y, t2y)),
                jnp.fmax(t1z, t2z),
            )
            hit = (far >= near) & (far > 0.0) & (near < t_cap)
            return jnp.min(jnp.where(hit, near, BIG))

        # one shared closure per wave (op-identical to the resident
        # kernel's test; traversal.make_test_tri has the v17 math notes)
        _tt = [
            make_test_tri(
                oo[w_], od[w_], None if num_instances == 1 else i,
                occlusion, carry_uv=carry_uv, carry_n=carry_n,
            )
            for w_ in range(WAVES)
        ]

        def test_tri(w, rec, k, live, *st):
            return _tt[w](rec, k, live, *st)

        def read_nodes_wide(sps):
            """Scalar stack-top reads for the next 2*POP_K wide pops."""
            nodes, acts = [], []
            for w in range(WAVES):
                sp = sps[w]
                base = w * stack_sz
                nw, aw = [], []
                for j in range(POP_K):
                    aw.append((sp > j).astype(jnp.int32))
                    nw.append(smem_ref[base + jnp.maximum(sp - 1 - j, 0)])
                nodes.append(tuple(nw))
                acts.append(tuple(aw))
            return tuple(nodes), tuple(acts)

        def fetch_recs_wide(nodes):
            return tuple(
                tuple(fetch32(nodes[w][j]) for j in range(POP_K))
                for w in range(WAVES)
            )

        def box_phase_wide(recs, t_bs):
            """Vector phase: 4-child slab tests per popped record, one
            count+permutation word per pop (kernels/wide4.py scheme)."""
            words = [[None] * POP_K for _ in range(WAVES)]
            for w in range(WAVES):
                for j in range(POP_K):
                    rec = recs[w][j]
                    ds = [packet_entry(w, rec, 6 * c, t_bs[w])
                          for c in range(4)]
                    hs = [(d < BIG).astype(jnp.int32) for d in ds]
                    word = hs[0] + hs[1] + hs[2] + hs[3]
                    for c in range(4):
                        r = jnp.int32(0)
                        for k in range(4):
                            if k == c:
                                continue
                            r = r + (
                                (ds[k] < ds[c])
                                | ((ds[k] == ds[c]) & (k < c))
                            ).astype(jnp.int32)
                        word = word + jnp.left_shift(
                            jnp.int32(c), 3 + 2 * r
                        )
                    words[w][j] = word
            if PACK_WORDS:
                for j in range(POP_K):
                    smem_ref[_s_push + j] = words[0][j] + jnp.left_shift(
                        words[1][j], 16
                    )
            else:
                for w in range(WAVES):
                    for j in range(POP_K):
                        smem_ref[_s_push + w * POP_K + j] = words[w][j]

        def read_word_wide(w, j):
            if PACK_WORDS:
                return (smem_ref[_s_push + j] >> (16 * w)) & 0xFFFF
            return smem_ref[_s_push + w * POP_K + j]

        def popk_dual_wide(sps, t_bs, pre=None):
            """Wide-mode combined pop: up to POP_K 4-wide nodes from
            EACH tile per sync. Vector phase packs one count+permutation
            word per pop; scalar phase reads child codes SMEM-direct.
            ``pre`` = (nodes, acts, recs) carried from the previous
            body's prefetch (TRT_DUAL_PIPE)."""
            if pre is None:
                nodes, acts = read_nodes_wide(sps)
                recs = fetch_recs_wide(nodes)
            else:
                nodes, acts, recs = pre
            box_phase_wide(recs, t_bs)

            # --- scalar phase (single combined stall, both tiles) ---
            sp_out = []
            leaves = []
            nls = []
            pops = jnp.int32(0)
            tadd = jnp.int32(0)
            for w in range(WAVES):
                spm = sps[w]
                for j in range(POP_K):
                    spm = spm - acts[w][j]
                sp_o = spm
                base = w * stack_sz
                lbase = _s_leaf + w * 8 * POP_K
                nl = jnp.int32(0)
                leaf = []
                for j in reversed(range(POP_K)):
                    node, act = nodes[w][j], acts[w][j]
                    w_ = read_word_wide(w, j)
                    count = (w_ & 7) * act
                    pop_leaves = []
                    for p in reversed(range(4)):  # farthest -> nearest
                        csel = (w_ >> (3 + 2 * p)) & 3
                        active = (count > p).astype(jnp.int32)
                        code = code_ref[4 * node + csel]
                        is_int = ((code >= 0).astype(jnp.int32)) * active
                        # clamp: the unconditional scratch write must
                        # never leave a NEGATIVE leaf code in a stack
                        # slot — a finished tile keeps popping slot 0
                        # while its sibling runs, and a negative node
                        # id faults the record fetch (r3 TPU crash)
                        smem_ref[base + sp_o] = jnp.maximum(code, 0)
                        sp_o = sp_o + is_int
                        if not flat_leaf:
                            packed = -code - 1
                            lcount = (packed & MAX_LEAF_TRIS) * (active - is_int)
                            pop_leaves.append((packed >> LEAF_BITS, lcount))
                    if flat_leaf:
                        # second pass NEAREST-first: compact real leaves
                        # into the dense per-tile list, same global
                        # order as the non-flat python leaf list (pops
                        # j=POP_K-1..0, nearest-first within each pop)
                        for p in range(4):
                            csel = (w_ >> (3 + 2 * p)) & 3
                            active = (count > p).astype(jnp.int32)
                            code = code_ref[4 * node + csel]
                            is_leaf_ = ((code < 0).astype(jnp.int32)) * active
                            packed = -code - 1
                            lcount = (packed & MAX_LEAF_TRIS) * is_leaf_
                            # unconditional write + conditional advance:
                            # non-leaf slots scratch-write and are never
                            # read (the drain is bounded by nl)
                            smem_ref[lbase + 2 * nl] = packed >> LEAF_BITS
                            smem_ref[lbase + 2 * nl + 1] = lcount
                            nl = nl + (lcount > 0).astype(jnp.int32)
                            tadd = tadd + lcount
                    else:
                        leaf.extend(pop_leaves[::-1])
                    pops = pops + act
                sp_out.append(sp_o)
                nls.append(nl)
                leaves.append(leaf)  # nearest-first within each pop
            if flat_leaf:
                return sp_out, nls, pops, tadd
            return sp_out, leaves, pops

        def popk_dual(sps, t_bs):
            """Pop up to POP_K nodes from EACH tile's stack in ONE
            combined vector/scalar round-trip (2*POP_K pops per sync).
            All vector stores are issued before any scalar read; the
            two tiles' fetch->reduce chains are independent, giving the
            scheduler real overlap (unlike the shared-stack r1 dual
            wave)."""
            nodes = [[] for _ in range(WAVES)]
            acts = [[] for _ in range(WAVES)]
            for w in range(WAVES):
                sp = sps[w]
                base = w * stack_sz
                for j in range(POP_K):
                    acts[w].append((sp > j).astype(jnp.int32))
                    nodes[w].append(smem_ref[base + jnp.maximum(sp - 1 - j, 0)])

            # --- vector phase: issue everything, read nothing ---
            for w in range(WAVES):
                for j in range(POP_K):
                    node = nodes[w][j]
                    s = w * POP_K + j
                    if not smem_codes:
                        crow = code_ref[pl.ds(node // TILE_L, 1), :]
                        smem_ref[_s_code + s] = jnp.sum(
                            jnp.where(lane1 == node % TILE_L, crow, 0)
                        )
                    rec = fetch_record(node)
                    da = packet_entry(w, rec, 0, t_bs[w])
                    db = packet_entry(w, rec, 6, t_bs[w])
                    smem_ref[_s_push + s] = (
                        (da <= db).astype(jnp.int32)
                        + 2 * (da < BIG).astype(jnp.int32)
                        + 4 * (db < BIG).astype(jnp.int32)
                    )

            # --- scalar phase (single combined stall for both tiles) ---
            sp_out = []
            leaves = []
            pops = jnp.int32(0)
            for w in range(WAVES):
                spm = sps[w]
                for j in range(POP_K):
                    spm = spm - acts[w][j]
                sp_o = spm
                base = w * stack_sz
                leaf = []
                for j in reversed(range(POP_K)):
                    node, act = nodes[w][j], acts[w][j]
                    s = w * POP_K + j
                    if smem_codes:
                        code = code_ref[node]
                    else:
                        code = smem_ref[_s_code + s]
                    is_int = ((code >= 0).astype(jnp.int32)) * act
                    ca = node + 1
                    cb = jnp.maximum(code, 0)
                    w_ = smem_ref[_s_push + s] * is_int
                    a_first = 1 - (w_ & 1)
                    pa = (w_ >> 1) & 1
                    pb = (w_ >> 2) & 1
                    first = jnp.where(a_first == 1, ca, cb)
                    p_first = jnp.where(a_first == 1, pa, pb)
                    second = jnp.where(a_first == 1, cb, ca)
                    p_second = jnp.where(a_first == 1, pb, pa)
                    smem_ref[base + sp_o] = first
                    sp_o = sp_o + p_first
                    smem_ref[base + sp_o] = second
                    sp_o = sp_o + p_second
                    packed = -code - 1
                    start = packed >> LEAF_BITS
                    leaf_flag = act - is_int
                    count = (packed & MAX_LEAF_TRIS) * leaf_flag
                    leaf.append((start, count))
                    pops = pops + act
                sp_out.append(sp_o)
                leaves.append(leaf[::-1])  # nearest-first
            return sp_out, leaves, pops

        def _row_tests(w, kr, count_end, acc):
            """Test one packed 8-triangle row into ``acc`` (a state
            tuple: (t, tri, inst) + (u, v) when carry_uv)."""
            row_i = jnp.minimum(kr // REC_PER_ROW, tri_rows - 1)
            row = trif_ref[pl.ds(row_i, 1), :]
            rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
            for u_ in range(LEAF_UNROLL):
                k = kr + u_
                mask = lane16 == u_ * REC_LANES + sub16  # static
                vals = jnp.sum(
                    jnp.where(mask, rep, 0.0), axis=1, keepdims=True
                )
                rec = vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)
                acc = test_tri(w, rec, k, k < count_end, *acc)
            return acc

        def single_leaf_loop(w, start, count, st):
            """One tile's leaf loop (TRT_DUAL_FUSED=0): no cross-tile
            fusion, so no max(nA,nB) overshoot waste — the A/B that
            killed the fused variant (r3: fused 130.4 vs 145 single).
            LEAF_U > 8 issues multiple independent row loads per
            iteration (overshoot rows clamped in-bounds, tests masked
            by the count)."""
            n_rows = LEAF_U // REC_PER_ROW
            n_quads = (count + LEAF_U - 1) // LEAF_U

            if not LEAF_ACC or n_rows == 1:
                def quad_body(q, acc):
                    k0 = start + q * LEAF_U
                    for r in range(n_rows):
                        acc = _row_tests(
                            w, k0 + r * REC_PER_ROW, start + count, acc
                        )
                    return acc

                return jax.lax.fori_loop(0, n_quads, quad_body, st)

            # TRT_LEAF_ACC=1: each row parity chains into a PRIVATE
            # accumulator — the rows' ~35-op test chains stay fully
            # independent instead of serializing through one t_best.
            # Exactness: within one leaf, test order == ascending k, so
            # the sequential strict `t < t_b` update is the
            # lexicographic (t, k) min; merging the fresh accumulators
            # by that key and folding into the prior state with a
            # strict t-compare reproduces it bit-for-bit (equal-t ties
            # keep the earlier triangle / the pre-existing hit).
            fresh = _fresh_state()

            def quad_body_acc(q, accs):
                k0 = start + q * LEAF_U
                return tuple(
                    _row_tests(w, k0 + r * REC_PER_ROW, start + count, accs[r])
                    for r in range(n_rows)
                )

            accs = jax.lax.fori_loop(
                0, n_quads, quad_body_acc, (fresh,) * n_rows
            )
            merged = accs[0]
            for other in accs[1:]:
                mt, mtri = merged[0], merged[1]
                t2, tri2 = other[0], other[1]
                take = (t2 < mt) | ((t2 == mt) & (tri2 >= 0) & (tri2 < mtri))
                merged = tuple(
                    jnp.where(take, b, a) for a, b in zip(merged, other)
                )
            take = merged[0] < st[0]
            return tuple(
                jnp.where(take, b, a) for a, b in zip(st, merged)
            )

        def leaf_drain(w, nl, st):
            """Flat-leaf drain (wide mode, static max_leaf <= LEAF_U):
            ONE fori over the compacted leaf list replaces 4*POP_K
            per-slot dynamic fori_loops — each of those is a Mosaic
            loop construct whose scalar bound check serializes the
            schedule even when the slot is empty. Every entry is a
            straight-line LEAF_U-triangle block (no inner loop), valid
            because no leaf in the tree exceeds LEAF_U triangles."""
            lbase = _s_leaf + w * 8 * POP_K
            n_rows = LEAF_U // REC_PER_ROW

            def entry_body(q, acc):
                start = smem_ref[lbase + 2 * q]
                count = smem_ref[lbase + 2 * q + 1]
                for r_ in range(n_rows):
                    acc = _row_tests(
                        w, start + r_ * REC_PER_ROW, start + count, acc
                    )
                return acc

            return jax.lax.fori_loop(0, nl, entry_body, st)

        def leaf_drain_fused(nls, stA, stB):
            """Fused flat-leaf drain: ONE fori bounded by max(nlA, nlB)
            whose iteration runs both tiles' entries — 2*n_rows
            independent row chains per step, halving the serial drain
            steps when the tiles' leaf counts are balanced. Unlike the
            row-level FUSED_LEAVES loss (max over every pop slot), the
            overshoot here is only |nlA - nlB| entries per sync.
            Overshoot slots can hold STALE entries from earlier syncs
            (the compaction scratch-writes unconditionally), so their
            tests are masked via count=0 — extra tests would be
            geometrically valid but can shift exact-t tie winners."""
            n_rows = LEAF_U // REC_PER_ROW

            def entry_body(q, accs):
                outs = []
                for w in range(2):
                    lbase = _s_leaf + w * 8 * POP_K
                    start = smem_ref[lbase + 2 * q]
                    count = smem_ref[lbase + 2 * q + 1] * (
                        (q < nls[w]).astype(jnp.int32)
                    )
                    acc = accs[w]
                    for r_ in range(n_rows):
                        acc = _row_tests(
                            w, start + r_ * REC_PER_ROW, start + count, acc
                        )
                    outs.append(acc)
                return outs[0], outs[1]

            return jax.lax.fori_loop(
                0, jnp.maximum(nls[0], nls[1]), entry_body, (stA, stB)
            )

        def dual_leaf_loop(sa, ca, sb, cb, sts):
            """Fused leaf loop: each iteration tests one 8-triangle row
            for tile A and one for tile B (independent load->extract->
            test chains). Bounded by the larger quad count; the smaller
            tile's overshoot rows are clamped in-bounds and masked dead
            by the count test."""
            stA, stB = sts
            n_quads = jnp.maximum(
                (ca + LEAF_UNROLL - 1) // LEAF_UNROLL,
                (cb + LEAF_UNROLL - 1) // LEAF_UNROLL,
            )

            def quad_body(q, acc):
                stA, stB = acc
                outs = []
                for w, (start, count, st) in enumerate(
                    ((sa, ca, stA), (sb, cb, stB))
                ):
                    k0 = start + q * LEAF_UNROLL
                    row_i = jnp.minimum(k0 // REC_PER_ROW, tri_rows - 1)
                    row = trif_ref[pl.ds(row_i, 1), :]
                    rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
                    for u_ in range(LEAF_UNROLL):
                        k = k0 + u_
                        mask = lane16 == u_ * REC_LANES + sub16  # static
                        vals = jnp.sum(
                            jnp.where(mask, rep, 0.0), axis=1, keepdims=True
                        )
                        rec = vals + jnp.zeros(
                            (REC_LANES, TILE_L), jnp.float32
                        )
                        st = test_tri(w, rec, k, k < start + count, *st)
                    outs.append(st)
                return outs[0], outs[1]

            return jax.lax.fori_loop(0, n_quads, quad_body, (stA, stB))

        def _drain_all(nls, sts):
            if DRAIN_FUSED:
                assert WAVES == 2, "TRT_DRAIN_FUSED pairs tiles"
                return list(leaf_drain_fused(nls, sts[0], sts[1]))
            return [leaf_drain(w, nls[w], sts[w]) for w in range(WAVES)]

        def body_pipe(carry):
            """TRT_DUAL_PIPE body: this sync's records were fetched at
            the END of the previous body (before its leaf drains), so
            the pop phase starts straight at the box tests; the next
            sync's stack reads + record fetches issue before this
            body's drains, giving the scheduler the whole drain to
            cover the fetch chain's latency."""
            sps, sts, np_, nt_, nodes, acts, recs = carry
            sts = list(sts)
            sps, nls, pops, tadd = popk_dual_wide(
                sps, tuple(st[0] for st in sts), pre=(nodes, acts, recs)
            )
            nodes2, acts2 = read_nodes_wide(sps)
            recs2 = fetch_recs_wide(nodes2)
            sts = _drain_all(nls, sts)
            return (tuple(sps), tuple(sts), np_ + pops, nt_ + tadd,
                    nodes2, acts2, recs2)

        def body(carry):
            sps, sts, np_, nt_ = carry
            sts = list(sts)
            t_bs = tuple(st[0] for st in sts)
            if wide and flat_leaf:
                sps, nls, pops, tadd = popk_dual_wide(sps, t_bs)
                sts = _drain_all(nls, sts)
                return tuple(sps), tuple(sts), np_ + pops, nt_ + tadd
            pop_fn = popk_dual_wide if wide else popk_dual
            sps, leaves, pops = pop_fn(sps, t_bs)
            nt = nt_
            if FUSED_LEAVES:
                assert WAVES == 2, "TRT_DUAL_FUSED pairs tiles"
                for (sa, ca), (sb, cb) in zip(leaves[0], leaves[1]):
                    sts = list(dual_leaf_loop(sa, ca, sb, cb, tuple(sts)))
                    nt = nt + ca + cb
            else:
                for w in range(WAVES):
                    for sa, ca in leaves[w]:
                        sts[w] = single_leaf_loop(w, sa, ca, sts[w])
                        nt = nt + ca
            return tuple(sps), tuple(sts), np_ + pops, nt

        def _any_live(sps):
            live = sps[0] > 0
            for sp in sps[1:]:
                live = live | (sp > 0)
            return live

        root = inst_root_ref[i]
        for w in range(WAVES):
            smem_ref[w * stack_sz] = root
        sps0 = (jnp.int32(1),) * WAVES
        if PIPE and wide and flat_leaf:
            nodes0, acts0 = read_nodes_wide(sps0)
            recs0 = fetch_recs_wide(nodes0)
            carry = (sps0, tuple(best), n_pops, n_tests,
                     nodes0, acts0, recs0)
            carry = jax.lax.while_loop(
                lambda c: _any_live(c[0]), body_pipe, carry
            )
            _, bests, n_pops, n_tests = carry[:4]
        else:
            carry = (sps0, tuple(best), n_pops, n_tests)
            carry = jax.lax.while_loop(
                lambda c: _any_live(c[0]), body, carry
            )
            _, bests, n_pops, n_tests = carry
        best = list(bests)

    for w in range(WAVES):
        t_b, tri_b, in_b = best[w][:3]
        if num_instances == 1:
            in_b = jnp.where(tri_b >= 0, 0, in_b)
        t_out_ref[0, w] = jnp.where(t_b >= BIG, _FLT_MAX, t_b)
        tri_out_ref[0, w] = tri_b
        inst_out_ref[0, w] = in_b
        for e in range(n_extra):
            extra_out_refs[e][0, w] = best[w][3 + e]
    if with_stats:
        zeros = jnp.zeros((TILE_S, TILE_L), jnp.int32)
        pops_ref[0, 0] = zeros + n_pops
        tests_ref[0, 0] = zeros + n_tests
        for w in range(1, WAVES):
            pops_ref[0, w] = zeros
            tests_ref[0, w] = zeros


def _run_dual(scene: SceneArrays, tiled, interpret: bool, worigin=None,
              wide: bool = False, occlusion: bool = False,
              carry_uv: bool = False, carry_n: bool = False):
    """Invoke the dual kernel over [n_tiles, TILE_S, 128] ray tiles,
    WAVES tiles per grid step (n_tiles padded up to a multiple).
    ``wide`` swaps the binary node tables for the 4-wide collapse
    (scene.wide4)."""
    uniform_o = worigin is not None
    comps = list(tiled)
    n_tiles = comps[0].shape[0]
    pad = (-n_tiles) % WAVES
    if pad:
        comps = [
            jnp.concatenate([a] + [a[-1:]] * pad, axis=0) for a in comps
        ]
        n_tiles += pad
    # [n2, WAVES, TILE_S, 128]
    comps = [a.reshape(-1, WAVES, TILE_S, TILE_L) for a in comps]
    n2 = comps[0].shape[0]

    smem_codes = scene.node_child_a.shape[0] * 4 <= SMEM_CODE_BUDGET
    (inst_tab, inst_root), (code_arr, nodef), (trif,) = _scene_kernel_inputs(
        scene, bf16_box=False, smem_codes=smem_codes
    )
    flat_leaf = False
    if wide:
        tables = scene.wide4
        code_arr = tables.wcode  # [4W] i32, SMEM-resident
        nodef = tables.wnodef  # 32-lane records
        inst_root = tables.wroot[scene.inst_mesh]
        smem_codes = True
        # compacted leaf drain: valid only when the STATIC max leaf
        # count fits one LEAF_U block (true at the default min_leaf 16)
        flat_leaf = (
            tables.max_leaf <= LEAF_U
            and os.environ.get("TRT_LEAF_COMPACT", "1") != "0"
        )
    with_stats = _stats_enabled()

    ray_spec = pl.BlockSpec(
        (1, WAVES, TILE_S, TILE_L), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vmem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    smem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    code_spec = smem_whole if smem_codes else vmem_whole

    if uniform_o:
        wo = jnp.asarray(worigin, jnp.float32)
        inputs = (inst_tab, inst_root, wo, *comps, code_arr, nodef, trif)
        in_specs = (
            [smem_whole(inst_tab), smem_whole(inst_root), smem_whole(wo)]
            + [ray_spec] * 3
            + [code_spec(code_arr), vmem_whole(nodef), vmem_whole(trif)]
        )
    else:
        inputs = (inst_tab, inst_root, *comps, code_arr, nodef, trif)
        in_specs = (
            [smem_whole(inst_tab), smem_whole(inst_root)]
            + [ray_spec] * 6
            + [code_spec(code_arr), vmem_whole(nodef), vmem_whole(trif)]
        )
    f32s = jax.ShapeDtypeStruct((n2, WAVES, TILE_S, TILE_L), jnp.float32)
    i32s = jax.ShapeDtypeStruct((n2, WAVES, TILE_S, TILE_L), jnp.int32)
    n_extra = (2 if carry_uv else 0) + (3 if carry_n else 0)
    out_shape = (
        (f32s, i32s, i32s)
        + (f32s,) * n_extra
        + ((i32s, i32s) if with_stats else ())
    )
    kernel = functools.partial(
        _dual_kernel, scene.num_instances, with_stats, uniform_o,
        smem_codes, trif.shape[0], wide, flat_leaf, occlusion, carry_uv,
        carry_n,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n2,),
        in_specs=in_specs,
        out_specs=(ray_spec,) * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_smem_layout(wide)[3],), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    extra = ()
    if n_extra:
        extra = outs[3:3 + n_extra]
        outs = outs[:3] + outs[3 + n_extra:]
    if with_stats:
        t, tri, inst, pops, tests = outs
        from .traversal import _LAST_STATS

        _LAST_STATS["pops"] = pops[:, :, 0, 0].reshape(-1)
        _LAST_STATS["tests"] = tests[:, :, 0, 0].reshape(-1)
    else:
        t, tri, inst = outs
    unstack = lambda a: a.reshape(-1, TILE_S, TILE_L)[: tiled[0].shape[0]]
    return tuple(unstack(a) for a in (t, tri, inst) + extra)


def cast_rays_dual(scene: SceneArrays, origin, directions, interpret=None,
                   wide: bool | None = None, occlusion: bool = False,
                   want_normals: bool = False):
    """Nearest-hit query with the dual-tile interleaved kernel. Same
    Hit record and ray-layout handling as cast_rays_pallas. ``wide``
    pops 4-wide collapsed nodes (needs scene.wide4); defaults to wide
    when the tables are present (TRT_DUAL_WIDE=0 forces binary).

    On textured scenes (scene.has_textures, a static flag) the kernel
    additionally carries the accepted barycentric u/v and returns them
    on the Hit record — hit_attributes then skips the object-space
    barycentric redo (PERF_LOG r3: the attrs wall)."""
    from ..render.renderer import Hit  # local: avoids cycle

    if wide is None:
        wide = (
            scene.wide4 is not None
            and os.environ.get("TRT_DUAL_WIDE", "1") != "0"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Default ON only on real TPU: the same-device oracle (tests/
    # test_pallas_tpu.py) holds there — Mosaic's fused u/v match the
    # XLA oracle bit-for-bit. CPU INTERPRET mode contracts FMAs
    # differently (ulp-level u/v drift, see intersect.EDGE_EPS notes),
    # so interpret keeps the redo path unless TRT_CARRY_UV=1 forces it
    # (test_carry_uv.py exercises that with an honest tolerance).
    env_uv = os.environ.get("TRT_CARRY_UV")
    carry_uv = (
        scene.has_textures and not occlusion
        and (env_uv == "1" if env_uv is not None else not interpret)
    )
    # Face-normal carry (want_normals: the caller's lighting mode needs
    # attrs.normal): 3 pure selects per tested row — bit-exact on every
    # platform (no arithmetic) — but the LOCATION shortcut it unlocks
    # (plane point from hit.t) shares carry_uv's interpret caveat, so
    # it takes the same gate. TRT_CARRY_N overrides independently (the
    # 3 extra state tiles vs a [T, 3] normal gather is a per-workload
    # tradeoff; attrs falls back to the gather when n is not carried).
    env_n = os.environ.get("TRT_CARRY_N", env_uv)
    carry_n = (
        want_normals and not occlusion
        and (env_n == "1" if env_n is not None else not interpret)
    )
    directions = jnp.asarray(directions, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    uniform_o = origin.ndim == 1
    worigin = origin if uniform_o else None
    if not uniform_o:
        origin = jnp.broadcast_to(origin, directions.shape)
    shape = directions.shape[:-1]

    use_2d = (
        len(shape) == 2
        and shape[0] % PIX_H == 0
        and shape[1] % PIX_W == 0
    )
    if use_2d:
        h, w = shape
        srcs = [(directions, 0), (directions, 1), (directions, 2)]
        if not uniform_o:
            srcs = [(origin, 0), (origin, 1), (origin, 2)] + srcs
        tiled = tuple(_image_to_tiles(a[..., c]) for a, c in srcs)
        outs = _run_dual(scene, tiled, interpret, worigin, wide,
                         occlusion, carry_uv, carry_n)
        imgs = tuple(_tiles_to_image(a, h, w) for a in outs)
        return _hit_from_outs(Hit, imgs, carry_uv, carry_n)

    flat_d = directions.reshape(-1, 3)
    r = flat_d.shape[0]
    pad = (-r) % TILE
    if pad:
        flat_d = jnp.concatenate(
            [flat_d, jnp.broadcast_to(flat_d[-1:], (pad, 3))]
        )
    srcs = [(flat_d, 0), (flat_d, 1), (flat_d, 2)]
    if not uniform_o:
        flat_o = origin.reshape(-1, 3)
        if pad:
            flat_o = jnp.concatenate(
                [flat_o, jnp.broadcast_to(flat_o[-1:], (pad, 3))]
            )
        srcs = [(flat_o, 0), (flat_o, 1), (flat_o, 2)] + srcs
    tiled = tuple(a[:, c].reshape(-1, TILE_S, TILE_L) for a, c in srcs)
    outs = _run_dual(scene, tiled, interpret, worigin, wide,
                     occlusion, carry_uv, carry_n)
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return _hit_from_outs(Hit, tuple(unpack(a) for a in outs),
                          carry_uv, carry_n)
