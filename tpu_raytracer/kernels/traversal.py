"""Pallas TPU packet BVH traversal — the render hot path.

TPU-native redesign of the reference's per-thread divergent stack walk
(raycast.cu:54-138). A CUDA thread owns one ray and one stack; a TPU
core owns a PACKET of TILE_S x 128 coherent rays (one PIX_H x PIX_W
pixel block; 4096 rays measured optimal) and ONE shared node stack in
SMEM:

  * the scalar core pops nodes and decides descent order;
  * the VPU tests each node's child AABBs against all 4096 rays at once
    (dense slab tests, BVHTree.hpp:40-54);
  * a child is descended if ANY lane's entry distance beats its current
    best (packet traversal a la CPU-SIMD ray tracing), near child first
    by packet-min entry distance (raycast.cu:72-79);
  * leaves run dense masked plane + barycentric triangle tests
    (TrianglePrimitive.hpp:62-79, 151-169) across the whole tile, one
    triangle (broadcast fields) per step, backface cull folded in
    (raycast.cu:107-109).

Probed Mosaic constraints that shaped the implementation: no dynamic
lane indexing, no scalar stores to VMEM, vector-derived scalars must
round-trip through SMEM to drive control flow, and the only broadcast-
producing extraction is a masked keepdims-reduce. Hence:

  * per-node/per-triangle fields are packed into 16-lane records, 8 per
    128-lane row; ONE dynamic-sublane row load + ONE batched masked
    reduce fetches a whole record as [16, 128] broadcast rows;
  * both children's boxes are stored in the PARENT record, so a node
    pop costs one control-word round-trip + one record fetch;
  * the control word packs everything scalar: internal -> child_b
    (child_a is implicitly node+1, DFS preorder), leaf ->
    leaf_start * 1024 + leaf_count, negated.

Round-2 latency work (the loop is latency-bound, not math-bound —
~438 cycles/iteration measured in round 1 with the vector->SMEM->scalar
round-trip dominating):

  * K=2 node pops per iteration: TWO nodes are popped, their codes,
    records and box tests all issued in one vector phase, and ONE
    combined scalar stall consumes all four SMEM words — halving the
    per-pop sync cost. Traversal order degrades slightly from pure
    near-first DFS (the second pop can't see the first's leaf t
    updates), costing a few extra visits for half the stalls.
  * precomputed triangle records: each 16-lane record carries
    v0, n, and the affine barycentric rows rA/rB
    (intersect.barycentric_rows) — so the in-kernel test is ~26 wide
    VPU ops per (ray, triangle) (v17; see make_test_tri) while staying
    BIT-IDENTICAL to the brute-force oracle (same f32 ops in the same
    order, just hoisted out of the kernel).

The whole SoA scene stays resident in VMEM across the ray-tile grid
(bunny-class is a few MB of the ~16MB default budget; the pallas_call
raises the compiler limit to 100MB). t_best carries across instances
(improving on the reference: earlier instances prune later ones).
Distances are object-space plane t values, equal to the reference's
world distances (see render/intersect.py).

Outputs the same compact (t, tri, inst) hit record as the XLA backends
(renderer.py), so attribute reconstruction and shading are shared.
Set TRT_KERNEL_STATS=1 to also return per-tile (node pops, triangle
tests) counters for performance analysis.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import transforms as T
from ..render import intersect
from ..render.intersect import EDGE_EPS, WATERTIGHT_NUDGE
from ..scene.scene import SceneArrays

TILE_L = 128  # lanes
# Pixel-block packet geometry; env-overridable for sweeps (PIX_H * PIX_W
# must be a multiple of 8 * TILE_L so TILE_S stays sublane-aligned).
PIX_H = int(os.environ.get("TRT_PIX_H", "64"))  # pixel block height
PIX_W = int(os.environ.get("TRT_PIX_W", "64"))  # pixel block width
TILE = PIX_H * PIX_W  # rays per packet (4096 measured optimal r1)
TILE_S = TILE // TILE_L  # sublanes (4 vregs per VPU op at 32)
assert TILE_S % 8 == 0, "packet sublanes must be 8-aligned"
# Packet-size sweep on the 82k-tri 1080p scene (pipelined timing):
# 32x32 (1024 rays) 74 Mrays/s, 64x64 (4096) 111.6, 64x128 (8192) 103.5
# -> bigger packets amortize the latency-bound pop loop until union
# growth wins; 64x64 is the sweet spot.
STACK_SIZE = 64  # max BVH depth 48 (reference caps 32, MeshPrimitive.cpp:54;
# deep grid scenes like the 627k-tri colonnade need ~33-40) + slack
REC_LANES = 16  # lanes per record slot
REC_PER_ROW = TILE_L // REC_LANES
# Python floats so they inline as literals (jnp scalars would be
# captured as unsupported kernel constants).
BIG = 3.0e38
PARALLEL_EPS = 1e-6
_FLT_MAX = 3.4028235e38
NUDGE = WATERTIGHT_NUDGE  # absolute slab-numerator out-round

LEAF_BITS = 10
LEAF_SHIFT = 1 << LEAF_BITS
MAX_LEAF_TRIS = LEAF_SHIFT - 1

# Nodes popped per scalar/vector sync. More pops per sync amortize the
# vector->SMEM->scalar round-trip (the measured per-iteration latency
# floor) at the cost of a degraded descent order: pops 2..K can't see
# pop 1's stack pushes or leaf t-updates.
# Swept on the 82k-tri 1080p config: K=2 131.7, K=3 135.4, K=4 134.2,
# K=6 116.8 Mrays/s. BUT on the deep, heavily occluded 256k-tri
# colonnade the stale order is catastrophic: K=2 32.8 vs K=3 13.3
# Mrays/s (r2 A/B). Default 2: the +3% K=3 buys on shallow scenes is
# not worth -60% on deep ones.
POP_K = int(os.environ.get("TRT_POP_K", "2"))

# Slab-test form: b*inv - (o*inv with o*inv hoisted per instance) = one
# fusable multiply-subtract per plane vs sub-then-mul (v14). See the
# rounding note at the use site; oracle-gated. TRT_FMA_BOX=0 reverts.
FMA_BOX = os.environ.get("TRT_FMA_BOX", "1") != "0"

# SMEM budget for the scalar-resident control-word table (v5e SMEM
# caps ~256KB; leave headroom for instance tables + the stack).
# TRT_SMEM_CODES=0 forces the VMEM code path for A/B.
SMEM_CODE_BUDGET = (
    0 if os.environ.get("TRT_SMEM_CODES", "1") == "0" else 200 * 1024
)

# E2: batch the POP_K x 2 child-entry cross-lane reduces into ONE
# [8,128] lane reduce + ONE packed SMEM push word per sync (needs
# POP_K <= 4). TRT_BATCH_REDUCE=1 enables for A/B.
BATCH_REDUCE = os.environ.get("TRT_BATCH_REDUCE", "0") == "1"
assert not (BATCH_REDUCE and POP_K > 4), "batched reduce packs 3 bits x POP_K"

# SMEM scratch slot map (after the stack)
_S_CODE = STACK_SIZE  # +POP_K
_S_PUSH = STACK_SIZE + POP_K  # +POP_K
_SMEM_SLOTS = STACK_SIZE + 2 * POP_K

LEAF_UNROLL = 8  # triangles tested per leaf-loop iteration (leaves avg ~12 at min_leaf 16)
# leaf_loop's one-row-per-quad fetch requires group == row width
assert LEAF_UNROLL == REC_PER_ROW


def make_test_tri(oo, od, inst_val, occlusion=False, carry_uv=False,
                  carry_n=False):
    """Build the dense per-triangle test closure shared by ALL Pallas
    kernels (binary, 4-wide, dual, TLAS, paged): one triangle record
    against the whole ray tile (TrianglePrimitive.hpp:62-79, 151-169;
    backface cull raycast.cu:107-109).

    Record layout (see _scene_kernel_inputs): v0 (rows 0-2), normal
    (3-5), affine barycentric rows rA (6-8) / rB (9-11) from
    intersect.barycentric_rows — u = rA.(p - v0), v = rB.(p - v0),
    evaluated as e2 = (o - v0) + t*d so the oracle's f32 rounding is
    reproduced exactly (intersect.point_in_triangle_uv uses the same
    fused form). v17 math-diet notes:
      * no `safe` denominator select: accepted lanes need
        denom <= -PARALLEL_EPS, and a 0-denominator lane's inf/NaN t
        fails every subsequent comparison, so masked-lane garbage is
        harmless and t on ACCEPTED lanes is bit-identical to the
        oracle's num/safe_denom;
      * e2 folds the hit-point construction: (o - v0) is a per-triangle
        row constant (cheap [1,128] subs), so e2 costs 3 wide FMAs
        instead of 3 FMAs (p) + 3 subs (p - v0);
      * u/v are 3 wide FMAs each vs ~12 wide ops for the dot00/dot01
        Cramer evaluation.
    ~14 fewer wide VPU ops per (ray, triangle) than v16 — leaf math is
    the flagship's wall-time floor (PERF_LOG r3 anatomy).

    ``oo``/``od`` are (x, y, z) object-space origin/direction tiles
    (origin components may be scalars on the uniform-origin path);
    ``inst_val`` is the instance id to record on hits, or None to skip
    instance tracking (single-instance kernels derive inst from tri_b
    at output time: where(tri >= 0, 0, -1)).

    ``occlusion``: ANY-HIT mode for shadow rays — an accepted hit sets
    the ray's best t to -BIG instead of t, so every subsequent slab
    test (near < t_cap) and triangle test (t < t_b) fails for that ray
    and its traversal work collapses immediately (the in-flight analog
    of dead-ray parking). Output semantics: t = -BIG means occluded,
    FLT_MAX means clear; nearest-hit ordering is NOT preserved (the
    first accepted hit wins), which is exactly what boolean shadow
    queries need (raycast.cu:263-287's cast is also boolean)."""
    oox, ooy, ooz = oo
    odx, ody, odz = od
    if (carry_uv or carry_n) and occlusion:
        raise ValueError("carried attributes are meaningless for "
                         "occlusion casts")

    def test_tri(rec, k, live, t_b, tri_b, in_b, *extra_b):
        """``carry_uv``: two extra state tiles (u_b, v_b) follow
        (t, tri, inst) — the accepted triangle's barycentric u/v are
        selected alongside t at accept time (2 extra wide selects per
        tested row). Downstream, hit_attributes rebuilds shading UVs
        from ONE [T, 6] uv-row gather instead of re-deriving the
        barycentrics through the object-space transform + [T, 18]
        record-gather chain — the measured r3 attrs wall on textured
        scenes. Bit-exact: u/v here ARE the oracle's u/v (shared
        affine rows + fused e2 form, see the v17 notes above)."""
        ax = rec[0:1, :]
        ay = rec[1:2, :]
        az = rec[2:3, :]
        nx = rec[3:4, :]
        ny = rec[4:5, :]
        nz = rec[5:6, :]
        rax = rec[6:7, :]
        ray_ = rec[7:8, :]
        raz = rec[8:9, :]
        rbx = rec[9:10, :]
        rby = rec[10:11, :]
        rbz = rec[11:12, :]
        denom = odx * nx + ody * ny + odz * nz
        cx = ax - oox
        cy = ay - ooy
        cz = az - ooz
        num = cx * nx + cy * ny + cz * nz
        # Mask-diet (v18): accepted lanes require denom <= -eps < 0, so
        # t >= 0 <=> num <= 0 (IEEE: num=+-0 gives t=+-0, and +-0 >= 0
        # is true; num>0/denom<0 gives t<0 — exactly the same accept
        # set). When the origin is uniform (primary rays), num is a
        # per-triangle ROW constant: poison num>0 rows to NaN on the
        # [1,128] row (NaN t fails every downstream compare) and drop
        # the WIDE t>=0 test entirely. Per-ray-origin callers keep the
        # wide test.
        num_is_row = num.ndim == 2 and num.shape[0] == 1
        if num_is_row:
            num = jnp.where(num <= 0.0, num, jnp.float32(jnp.nan))
        t = num / denom
        # e2 = (o - v0) + t*d evaluated as t*d - (v0 - o): IEEE negation
        # is exact and round-to-nearest is symmetric, so this is
        # bit-identical to the oracle's form while REUSING the t
        # numerator's differences (3 fewer wide ops when origins are
        # per-ray)
        e2x = t * odx - cx
        e2y = t * ody - cy
        e2z = t * odz - cz
        u = rax * e2x + ray_ * e2y + raz * e2z
        v = rbx * e2x + rby * e2y + rbz * e2z
        # EDGE_EPS-inclusive bounds: keeps edge-tie decisions OFF the
        # exact-zero point where Mosaic/XLA rounding diverges and
        # closes shared-edge cracks (see intersect.EDGE_EPS).
        # min(u,v) >= -eps is exactly (u >= -eps) & (v >= -eps) — one
        # wide op fewer (NaN propagates through minimum, so poisoned
        # lanes still fail).
        ok = (
            live
            & (denom <= -PARALLEL_EPS)
            & (jnp.minimum(u, v) >= -EDGE_EPS)
            & (u + v <= 1.0 + EDGE_EPS)
            & (t < t_b)
        )
        if not num_is_row:
            ok = ok & (t >= 0.0)
        hit_t = jnp.float32(-BIG) if occlusion else t
        out_t = jnp.where(ok, hit_t, t_b)
        out_tri = jnp.where(ok, k, tri_b)
        out_in = in_b if inst_val is None else jnp.where(ok, inst_val, in_b)
        out = (out_t, out_tri, out_in)
        i = 0
        if carry_uv:
            # ok broadcasts row-shaped u/v up to the state tile shape
            out = out + (jnp.where(ok, u, extra_b[0]),
                         jnp.where(ok, v, extra_b[1]))
            i = 2
        if carry_n:
            # the face normal rows are ALREADY in registers (the plane
            # test above used them) — carrying the accepted triangle's
            # normal is 3 pure selects, bit-exact on every platform
            # (no arithmetic), and lets lit shading modes skip the
            # [T, 18] record gather in hit_attributes entirely
            out = out + (jnp.where(ok, nx, extra_b[i]),
                         jnp.where(ok, ny, extra_b[i + 1]),
                         jnp.where(ok, nz, extra_b[i + 2]))
        return out

    return test_tri


def _hit_from_outs(Hit, outs, carry_uv, carry_n):
    """Assemble a Hit record from a kernel's flat output tuple
    (t, tri, inst[, u, v][, nx, ny, nz]) — shared by the dual and TLAS
    cast wrappers."""
    t, tri, inst = outs[:3]
    i = 3
    u = v = n = None
    if carry_uv:
        u, v = outs[i], outs[i + 1]
        i += 2
    if carry_n:
        n = jnp.stack(outs[i:i + 3], axis=-1)
    return Hit(t=t, tri=tri, inst=inst, u=u, v=v, n=n)


def _quat_rot(qw, qx, qy, qz, vx, vy, vz):
    """apply_quat (transforms.hpp:165-176) on [TILE_S,128] component
    tiles with scalar quaternion parts."""
    a = -vx * qx - vy * qy - vz * qz
    b = vx * qw + vy * qz - vz * qy
    c = vy * qw + vz * qx - vx * qz
    d = vz * qw + vx * qy - vy * qx
    rx = qw * b - qx * a - qy * d + qz * c
    ry = qw * c - qy * a - qz * b + qx * d
    rz = qw * d - qz * a - qx * c + qy * b
    return rx, ry, rz


def _traversal_kernel(
    num_instances: int,
    with_stats: bool,
    frustum: bool,
    bf16_box: bool,
    uniform_o: bool,
    smem_codes: bool,
    occlusion: bool,
    *refs,
):
    if uniform_o:
        # Uniform-origin specialization (primary rays: ONE camera
        # origin for the whole image). Ray-origin tiles are not passed;
        # worigin_ref carries the world origin, and per-instance
        # object-space origins become SCALARS — every (box - o) and
        # (A - o)·n intermediate collapses from [TILE_S, 128] to
        # [1, 128] row math, with bit-identical values.
        (
            inst_tab_ref,  # SMEM [I, 12] f32: quat(4) xyz(3) inv_scale(3) pad
            inst_root_ref,  # SMEM [I] i32 root node id
            frust_ref,  # SMEM [1, I, 12] f32 per-(tile,instance) packet bounds
            worigin_ref,  # SMEM [3] f32 world-space ray origin
            dx_ref, dy_ref, dz_ref,  # VMEM [1, TILE_S, 128] f32 ray directions
            code_ref,  # VMEM [ceil(N/128), 128] i32 packed control words
            nodef_ref,  # VMEM [ceil(N/8), 128] f32 16-lane records: A+B boxes
            trif_ref,  # VMEM [ceil(T/8), 128] f32 16-lane records (see module doc)
        ) = refs[:10]
        rest = refs[10:]
        ox_ref = oy_ref = oz_ref = None
    else:
        (
            inst_tab_ref,  # SMEM [I, 12] f32: quat(4) xyz(3) inv_scale(3) pad
            inst_root_ref,  # SMEM [I] i32 root node id
            frust_ref,  # SMEM [1, I, 12] f32 per-(tile,instance) packet bounds
            ox_ref, oy_ref, oz_ref,  # VMEM [1, TILE_S, 128] f32 ray origins
            dx_ref, dy_ref, dz_ref,  # VMEM [1, TILE_S, 128] f32 ray directions
            code_ref,  # VMEM [ceil(N/128), 128] i32 packed control words
            nodef_ref,  # VMEM [ceil(N/8), 128] f32 16-lane records: A+B boxes
            trif_ref,  # VMEM [ceil(T/8), 128] f32 16-lane records (see module doc)
        ) = refs[:12]
        rest = refs[12:]
    if with_stats:
        t_out_ref, tri_out_ref, inst_out_ref, pops_ref, tests_ref, smem_ref = rest
    else:
        t_out_ref, tri_out_ref, inst_out_ref, smem_ref = rest

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 0)

    def fetch_record(ref, k):
        """Fetch one 16-field record as a [16, 128] value whose row j is
        field j broadcast across all lanes."""
        row = ref[pl.ds(k // REC_PER_ROW, 1), :]
        rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
        mask = lane16 == (k % REC_PER_ROW) * REC_LANES + sub16
        vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
        return vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)

    dirs = tuple(r[0] for r in (dx_ref, dy_ref, dz_ref))
    if not uniform_o:
        origs = tuple(r[0] for r in (ox_ref, oy_ref, oz_ref))
    best = (
        jnp.full((TILE_S, TILE_L), BIG, jnp.float32),
        jnp.full((TILE_S, TILE_L), -1, jnp.int32),
        jnp.full((TILE_S, TILE_L), -1, jnp.int32),
    )
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

        # Object-space rays (raycast.cu:32-51)
        wdx, wdy, wdz = dirs
        odx, ody, odz = _quat_rot(qw, qx, qy, qz, wdx, wdy, wdz)
        odx, ody, odz = odx * sx, ody * sy, odz * sz
        if uniform_o:
            # scalar object-space origin: same f32 ops on scalars, so
            # every downstream value is bit-identical to the array path
            wox = worigin_ref[0]
            woy = worigin_ref[1]
            woz = worigin_ref[2]
        else:
            wox, woy, woz = origs
        oox, ooy, ooz = _quat_rot(qw, qx, qy, qz, wox - px, woy - py, woz - pz)
        oox, ooy, ooz = oox * sx, ooy * sy, ooz * sz

        def _inv(v):
            # finite huge reciprocal: avoids the 0 * inf = NaN
            # false-miss when a ray lies exactly in a box boundary
            # plane (see render/intersect.py safe_reciprocal)
            tiny = 1e-30
            safe = jnp.where(jnp.abs(v) < tiny,
                             jnp.where(v < 0, -tiny, tiny), v)
            return 1.0 / safe

        idx_, idy_, idz_ = _inv(odx), _inv(ody), _inv(odz)

        # With a scalar origin the plain (b - o) * inv form is cheaper:
        # the subtract is a [1, 128] row op, so each plane costs one
        # full-tile multiply — the hoisted-o*inv FMA form would make
        # both operands full [TILE_S, 128] tiles again.
        fma_box = FMA_BOX and not (bf16_box or frustum or uniform_o)
        if fma_box:
            oix, oiy, oiz = oox * idx_, ooy * idy_, ooz * idz_

        if bf16_box and not frustum:
            # bf16 slab tests (v12): same per-ray test + per-ray
            # t-pruning as the f32 path, at half the vector registers
            # per op. Conservative-superset correctness:
            #   * box fields are pre-rounded outward onto the bf16 grid
            #     at pack time (_bf16_below/_bf16_above), so the
            #     in-kernel convert is exact;
            #   * each t = fl(fl(b - o_bf) * inv_bf) carries relative
            #     error <= ~3*2^-8 plus |o*inv|*2^-8 absolute (o_bf and
            #     inv_bf are RN conversions); near/far are widened by
            #     |t|*2^-6 + wsum where wsum = sum_axis |o*inv|*2^-7;
            #   * the t-cap compares against t_best * (1 + 2^-6).
            # Every node the f32 test would descend is descended, so hit
            # results are unchanged (leaf tests stay f32 bit-exact);
            # only visit counts and equal-t tie order can differ.
            b16 = jnp.bfloat16
            obx = oox.astype(b16)
            oby = ooy.astype(b16)
            obz = ooz.astype(b16)
            ibx = idx_.astype(b16)
            iby = idy_.astype(b16)
            ibz = idz_.astype(b16)
            wsum = (
                jnp.abs(oox * idx_) + jnp.abs(ooy * idy_) + jnp.abs(ooz * idz_)
            ) * (2.0 ** -7)

            def packet_entry_bf16(rec, base, tb_wide):
                """Conservative bf16 packet slab test; returns the min
                widened entry over lanes whose test beats their widened
                best, or BIG. The sub/mul/min-max tree runs in bf16
                (half the vregs); near/far are widened back to f32 for
                the compare phase — v5e Mosaic has no bf16 vector
                compares ("Target does not support this comparison")."""
                r = lambda j: rec[base + j : base + j + 1, :].astype(b16)
                t1x = (r(0) - obx) * ibx
                t1y = (r(1) - oby) * iby
                t1z = (r(2) - obz) * ibz
                t2x = (r(3) - obx) * ibx
                t2y = (r(4) - oby) * iby
                t2z = (r(5) - obz) * ibz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z),
                ).astype(jnp.float32)
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z),
                ).astype(jnp.float32)
                near = near - (jnp.abs(near) * (2.0 ** -6) + wsum)
                far = far + (jnp.abs(far) * (2.0 ** -6) + wsum)
                hit = (far >= near) & (far > 0.0) & (near < tb_wide)
                return jnp.min(jnp.where(hit, near, BIG))

        if frustum:
            # Packet-frustum interval test (v11): instead of slab-testing
            # all TILE rays against each box (6 fields x [TILE_S, 128]
            # ops per child), test ONE conservative interval built from
            # the packet's object-space origin / reciprocal-direction
            # bounds (precomputed per tile+instance outside the kernel,
            # see _frustum_table). The whole test runs on the node's
            # [16, 128] record value — both children at once — cutting
            # the per-pop vector work ~10x. Conservative-superset
            # semantics: every node the per-ray test would descend is
            # descended (classic packet interval-arithmetic traversal a
            # la Wald06, re-derived for VPU row ops), so hit results are
            # unchanged; only visit counts (and t-ordering of equal-t
            # ties) can differ.
            g = lambda j: frust_ref[0, i, j]
            olx, oly, olz = g(0), g(1), g(2)
            ohx, ohy, ohz = g(3), g(4), g(5)
            ilx, ily, ilz = g(6), g(7), g(8)
            ihx, ihy, ihz = g(9), g(10), g(11)

            def row_const(vals):
                acc = jnp.zeros((REC_LANES, TILE_L), jnp.float32)
                for r, sv in enumerate(vals):
                    acc = jnp.where(sub16 == r, sv, acc)
                return acc

            # Numerator intervals: n = b - o with o in [oo_lo, oo_hi]
            # (the watertight NUDGE is baked into the packed box rows).
            sub_hi = row_const([ohx, ohy, ohz] * 4)
            sub_lo = row_const([olx, oly, olz] * 4)
            inv_lo_r = row_const([ilx, ily, ilz] * 4)
            inv_hi_r = row_const([ihx, ihy, ihz] * 4)

            def frustum_words(rec, t_cap11):
                """Push word for one node record: interval slab test of
                both child boxes. Product interval endpoints = extreme
                corner products; near_lo = max over axes of the slab-min
                lower bound, far_hi = min over axes of the slab-max
                upper bound."""
                nlo = rec - sub_hi
                nhi = rec - sub_lo
                p1 = nlo * inv_lo_r
                p2 = nlo * inv_hi_r
                p3 = nhi * inv_lo_r
                p4 = nhi * inv_hi_r
                tmn = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
                tmx = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))

                def box(b):
                    nears = jnp.minimum(tmn[b:b + 3, :], tmn[b + 3:b + 6, :])
                    fars = jnp.maximum(tmx[b:b + 3, :], tmx[b + 3:b + 6, :])
                    near = jnp.max(nears, axis=0, keepdims=True)
                    far = jnp.min(fars, axis=0, keepdims=True)
                    hit = (far >= near) & (far > 0.0) & (near < t_cap11)
                    return near, hit

                near_a, hit_a = box(0)
                near_b, hit_b = box(6)
                w = (
                    (near_a <= near_b).astype(jnp.int32)
                    + 2 * hit_a.astype(jnp.int32)
                    + 4 * hit_b.astype(jnp.int32)
                )
                return jnp.sum(jnp.where(lane1 == 0, w, 0))

        def packet_entry(rec, base, t_cap, row_reduce=False):
            """Packet slab test (BVHTree.hpp:40-54) against the box in
            record rows [base, base+6); returns the min entry over lanes
            that beat their best, or BIG. The absolute 1e-12 watertight
            out-round (see intersect.ray_aabb_entry) is BAKED into the
            packed box fields at pack time (_scene_kernel_inputs) —
            saves 6 vector adds per child test; the compile-time
            relative box pad (scene.py box_pad_ulp) covers the
            large-coordinate planes where an absolute 1e-12 would be
            rounded away."""
            bminx = rec[base + 0 : base + 1, :]
            bminy = rec[base + 1 : base + 2, :]
            bminz = rec[base + 2 : base + 3, :]
            bmaxx = rec[base + 3 : base + 4, :]
            bmaxy = rec[base + 4 : base + 5, :]
            bmaxz = rec[base + 5 : base + 6, :]
            if fma_box:
                # b*inv - (o*inv) with o*inv hoisted per instance: each
                # plane is ONE fusable multiply-subtract instead of
                # sub-then-mul (v14). Rounding differs from the exact
                # (b-o)*inv by ~2^-24*(|b|+|o|)*|inv|, within the
                # compile-time relative box pad except under extreme
                # origin/box magnitude mismatch; oracles (colonnade
                # 768-ray, bunny, cube/sphere) gate it. Exact-on-plane
                # rays stay exact: b == o gives fl(b*inv) - fl(o*inv)
                # == 0 identically.
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
            # fmin/fmax suppress the 0*inf NaN (origin exactly on a
            # box plane) like the reference's CUDA fminf/fmaxf.
            near = jnp.maximum(
                jnp.maximum(jnp.fmin(t1x, t2x), jnp.fmin(t1y, t2y)),
                jnp.fmin(t1z, t2z),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.fmax(t1x, t2x), jnp.fmax(t1y, t2y)),
                jnp.fmax(t1z, t2z),
            )
            hit = (far >= near) & (far > 0.0) & (near < t_cap)
            cand = jnp.where(hit, near, BIG)
            if row_reduce:
                # sublane-phase only: the cross-lane phase is batched
                # over all POP_K x 2 children in popk (TRT_BATCH_REDUCE)
                return jnp.min(cand, axis=0, keepdims=True)
            return jnp.min(cand)

        test_tri = make_test_tri(
            (oox, ooy, ooz), (odx, ody, odz),
            None if num_instances == 1 else i, occlusion,
        )

        def popk(sp, t_b):
            """Pop up to POP_K nodes in ONE vector/scalar round-trip.

            Straight-line, branchless (lax.cond regions fence the
            scheduler). All vector->SMEM stores (all codes + all push
            words) are issued before ANY scalar read, so the scalar core
            takes ONE combined stall for POP_K nodes instead of one per
            node. Returns (sp', [(start_j, count_j)...] nearest-first,
            pops) with counts 0 for internal/inactive pops."""
            nodes, acts = [], []
            spm = sp
            for j in range(POP_K):
                acts.append((sp > j).astype(jnp.int32))
                nodes.append(smem_ref[jnp.maximum(sp - 1 - j, 0)])
                spm = spm - acts[j]

            # --- vector phase: issue everything, read nothing ---
            batch_reduce = BATCH_REDUCE and not (frustum or bf16_box)
            if batch_reduce:
                rows_a, rows_b = [], []
                big_row = jnp.full((1, TILE_L), BIG, jnp.float32)
            if frustum:
                # Packet t-cap: max best-hit distance over all rays
                # (per-ray caps need per-ray tests; the packet bound is
                # the conservative scalar equivalent).
                t_cap11 = jnp.max(t_b, keepdims=True).reshape(1, 1)
            for j in range(POP_K):
                node = nodes[j]
                if not smem_codes:
                    # VMEM codes: dynamic row load + one-hot lane
                    # reduce, staged through SMEM for the scalar phase
                    crow = code_ref[pl.ds(node // TILE_L, 1), :]
                    smem_ref[_S_CODE + j] = jnp.sum(
                        jnp.where(lane1 == node % TILE_L, crow, 0)
                    )
                rec = fetch_record(nodef_ref, node)
                if frustum:
                    smem_ref[_S_PUSH + j] = frustum_words(rec, t_cap11)
                elif batch_reduce:
                    rows_a.append(packet_entry(rec, 0, t_b, row_reduce=True))
                    rows_b.append(packet_entry(rec, 6, t_b, row_reduce=True))
                else:
                    if bf16_box:
                        tb_wide = t_b * (1.0 + 2.0 ** -6)
                        da = packet_entry_bf16(rec, 0, tb_wide)
                        db = packet_entry_bf16(rec, 6, tb_wide)
                    else:
                        da = packet_entry(rec, 0, t_b)
                        db = packet_entry(rec, 6, t_b)
                    # Ordered push, far child first (raycast.cu:72-79);
                    # all vector-derived decisions in ONE sync word.
                    smem_ref[_S_PUSH + j] = (
                        (da <= db).astype(jnp.int32)
                        + 2 * (da < BIG).astype(jnp.int32)
                        + 4 * (db < BIG).astype(jnp.int32)
                    )

            if batch_reduce and not frustum:
                # E2 (TRT_BATCH_REDUCE): ONE cross-lane reduce + ONE
                # SMEM word for all POP_K x 2 children. packet_entry
                # already folded sublanes ([TILE_S,128] -> [1,128]);
                # stack A-children in rows 0..K-1 and B-children in
                # rows 4..4+K-1 of one [8,128] tile, lane-reduce it
                # once, then pack each pop's 3-bit push word into a
                # single SMEM scalar at 3j.
                pad_rows = [big_row] * (4 - POP_K)
                stacked = jnp.concatenate(
                    rows_a + pad_rows + rows_b + pad_rows, axis=0
                )
                mins = jnp.min(stacked, axis=1, keepdims=True)  # [8,1]
                da8 = mins[0:4]
                db8 = mins[4:8]
                words = (
                    (da8 <= db8).astype(jnp.int32)
                    + 2 * (da8 < BIG).astype(jnp.int32)
                    + 4 * (db8 < BIG).astype(jnp.int32)
                )  # [4,1]; rows >= POP_K come from BIG pads -> word 1
                sub41 = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)
                smem_ref[_S_PUSH] = jnp.sum(
                    jnp.where(sub41 < POP_K, words << (3 * sub41), 0)
                )

            # --- scalar phase (single combined stall) ---
            # The farthest pop's children go on the stack first so the
            # nearest pop's are popped first next iteration.
            sp_out = spm
            leaf = []
            for j in reversed(range(POP_K)):
                node, act = nodes[j], acts[j]
                if smem_codes:
                    # control word read DIRECTLY by the scalar core —
                    # no vector fetch, no staging store, no extra sync
                    code = code_ref[node]
                else:
                    code = smem_ref[_S_CODE + j]
                is_int = ((code >= 0).astype(jnp.int32)) * act
                ca = node + 1  # DFS preorder: left child follows parent
                cb = jnp.maximum(code, 0)
                if batch_reduce and not frustum:
                    w_ = ((smem_ref[_S_PUSH] >> (3 * j)) & 7) * is_int
                else:
                    w_ = smem_ref[_S_PUSH + j] * is_int
                a_first = 1 - (w_ & 1)
                pa = (w_ >> 1) & 1
                pb = (w_ >> 2) & 1
                first = jnp.where(a_first == 1, ca, cb)
                p_first = jnp.where(a_first == 1, pa, pb)
                second = jnp.where(a_first == 1, cb, ca)
                p_second = jnp.where(a_first == 1, pb, pa)
                smem_ref[sp_out] = first
                sp_out = sp_out + p_first
                smem_ref[sp_out] = second
                sp_out = sp_out + p_second

                packed = -code - 1
                start = packed >> LEAF_BITS
                leaf_flag = act - is_int  # 1 only for an active leaf pop
                count = (packed & MAX_LEAF_TRIS) * leaf_flag
                leaf.append((start, count))
            pops = acts[0]
            for a in acts[1:]:
                pops = pops + a
            # leaf was built farthest-first; reverse to nearest-first so
            # the nearest pop's triangles are tested first for pruning.
            return sp_out, leaf[::-1], pops

        def leaf_loop(start, count, st):
            """Leaf starts are 8-aligned (scene.py leaf layout), so each
            LEAF_UNROLL(=8)-triangle group is exactly ONE 128-lane row
            of the packed table: one dynamic row load shared by all 8
            tests, with compile-time extraction masks (vs one dynamic
            load + dynamic-masked cross-lane reduce per triangle)."""

            def quad_body(q, acc):
                t_b, tri_b, in_b = acc
                k0 = start + q * LEAF_UNROLL
                row = trif_ref[pl.ds(k0 // REC_PER_ROW, 1), :]
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
                    t_b, tri_b, in_b = test_tri(
                        rec, k, k < start + count, t_b, tri_b, in_b
                    )
                return t_b, tri_b, in_b

            n_quads = (count + LEAF_UNROLL - 1) // LEAF_UNROLL
            return jax.lax.fori_loop(0, n_quads, quad_body, st)

        def body(carry):
            sp, state, np_, nt_ = carry
            sp, leaves, pops = popk(sp, state[0])
            nt = nt_
            for s_, c_ in leaves:
                state = leaf_loop(s_, c_, state)
                nt = nt + c_
            return sp, state, np_ + pops, nt

        root = inst_root_ref[i]
        smem_ref[0] = root
        carry = (jnp.int32(1), best, n_pops, n_tests)
        carry = jax.lax.while_loop(lambda c: c[0] > 0, body, carry)
        _, best, n_pops, n_tests = carry

    t_b, tri_b, in_b = best
    if num_instances == 1:
        # test_tri skipped instance tracking (one select per triangle
        # saved); any hit is instance 0
        in_b = jnp.where(tri_b >= 0, 0, in_b)
    t_out_ref[0] = jnp.where(t_b >= BIG, _FLT_MAX, t_b)
    tri_out_ref[0] = tri_b
    inst_out_ref[0] = in_b
    if with_stats:
        zeros = jnp.zeros((TILE_S, TILE_L), jnp.int32)
        pops_ref[0] = zeros + n_pops
        tests_ref[0] = zeros + n_tests


def _pack128(a: jax.Array, fill) -> jax.Array:
    """Pad a 1-D array to a multiple of 128 and reshape [R, 128]."""
    n = a.shape[0]
    pad = (-n) % TILE_L
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(-1, TILE_L)


def _pack_records(fields, num) -> jax.Array:
    """Stack per-element field arrays into 16-lane records, 8 records
    per 128-lane row: element k lives at [k // 8, (k % 8) * 16 + j]."""
    cols = list(fields) + [jnp.zeros(num, jnp.float32)] * (REC_LANES - len(fields))
    rec = jnp.stack(cols, axis=1)  # [num, 16]
    # one extra row of padding so the unrolled leaf loop's overshoot
    # reads (masked off) stay in bounds
    pad = (-num) % REC_PER_ROW + REC_PER_ROW
    rec = jnp.concatenate([rec, jnp.zeros((pad, REC_LANES), jnp.float32)])
    return rec.reshape(-1, TILE_L)


def _bf16_below(x: jax.Array) -> jax.Array:
    """Largest bf16-representable f32 <= x (directed rounding for
    conservative bf16 box mins). Sub-1e-38 magnitudes may flush on TPU;
    geometry at that scale is zero in practice."""
    b = x.astype(jnp.bfloat16)
    bf = b.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(b, jnp.uint16)
    pos = bf >= 0
    stepped = jnp.where(
        pos,
        jnp.where(u == 0, jnp.uint16(0x8001), u - jnp.uint16(1)),
        u + jnp.uint16(1),
    )
    b2 = jax.lax.bitcast_convert_type(stepped, jnp.bfloat16).astype(jnp.float32)
    return jnp.where(bf > x, b2, bf)


def _bf16_above(x: jax.Array) -> jax.Array:
    """Smallest bf16-representable f32 >= x."""
    return -_bf16_below(-x)


def _scene_kernel_inputs(scene: SceneArrays, bf16_box: bool = False,
                         smem_codes: bool = False):
    """Derive the kernel's packed arrays from SceneArrays (pure jnp,
    fused into the surrounding jit).

    Triangle records carry v0, the face normal, and the PRECOMPUTED
    affine barycentric rows rA/rB — built by the SAME jnp function the
    oracle calls (intersect.barycentric_rows), so the kernels' u/v are
    bit-identical to the brute-force backend while the per-triangle
    in-kernel cost drops to ~26 wide ops (see make_test_tri)."""
    quat = T.euler2quat(scene.inst_pose[:, 3:6])
    pad = jnp.zeros((scene.num_instances, 2), jnp.float32)
    inst_tab = jnp.concatenate(
        [quat, scene.inst_pose[:, 0:3], scene.inst_inv_scale, pad], axis=1
    )
    inst_root = scene.mesh_root[scene.inst_mesh]

    # Node control word: internal -> child_b (child_a = node + 1 by DFS
    # preorder construction); leaf -> -(start * LEAF_SHIFT + count) - 1.
    is_leaf = scene.node_child_a < 0
    packed_leaf = scene.node_leaf_start * LEAF_SHIFT + scene.node_leaf_count
    code = jnp.where(is_leaf, -packed_leaf - 1, scene.node_child_b)
    if smem_codes:
        # raw [N] i32 — SMEM-resident, read directly by the scalar core
        code_arr = code.astype(jnp.int32)
    else:
        code_arr = _pack128(code.astype(jnp.int32), -1)

    # Both children's boxes in the parent's 16-lane record.
    ca = jnp.maximum(scene.node_child_a, 0)
    cb = jnp.maximum(scene.node_child_b, 0)
    box_fields = []
    for c in (ca, cb):
        # Bake the watertight absolute out-round (intersect.NUDGE) into
        # the packed fields so the kernel's slab test needs no runtime
        # nudge adds. At |coord| >> 1e-12 the nudge rounds away here,
        # but those planes are covered by the relative compile-time pad
        # (scene.py box_pad_ulp); colonnade oracle verifies the combo.
        mn = scene.node_min[c] - NUDGE
        mx = scene.node_max[c] + NUDGE
        if bf16_box:
            # Directed-round the boxes outward onto the bf16 grid so the
            # kernel's f32->bf16 convert of these fields is EXACT (RN of
            # a bf16-representable value): the only box inflation is one
            # bf16 ulp, and the bf16 slab test stays conservative.
            mn = _bf16_below(mn)
            mx = _bf16_above(mx)
        box_fields += [mn[:, 0], mn[:, 1], mn[:, 2], mx[:, 0], mx[:, 1], mx[:, 2]]
    nodef = _pack_records(box_fields, scene.node_child_a.shape[0])

    comps = lambda m: (m[:, 0], m[:, 1], m[:, 2])
    # Affine barycentric rows (intersect.barycentric_rows — the SAME
    # jnp function the oracle calls, so u/v stay bit-identical): the
    # in-kernel test needs just u = rA.(p - v0), v = rB.(p - v0),
    # which cuts ~8 wide VPU ops per (ray, triangle) vs shipping
    # e0/e1/dot products (r3: leaf math is the flagship's wall-time
    # floor). Fields 12-15 are spare.
    ra, rb = intersect.barycentric_rows(
        scene.tri_v0, scene.tri_v1, scene.tri_v2
    )
    zero = jnp.zeros_like(ra[:, 0])
    tri_fields = (
        comps(scene.tri_v0) + comps(scene.tri_normal)
        + comps(ra) + comps(rb)
        + (zero, zero, zero, zero)
    )
    trif = _pack_records(tri_fields, scene.num_triangles)
    return (inst_tab, inst_root), (code_arr, nodef), (trif,)


# Safety widen applied to the packet bounds: the in-kernel per-ray
# transform (_quat_rot + scale + _inv) is op-identical to the jnp
# computation below, but a few-ulp relative widen guards any future
# divergence at zero visit cost.
_FRUSTUM_REL = 4e-6
_FRUSTUM_ABS = 1e-12


def _frustum_table(scene: SceneArrays, tiled) -> jax.Array:
    """[n_tiles, I, 12] per-(tile, instance) packet bounds for the
    interval traversal: object-space origin min/max (6) and clamped
    reciprocal-direction min/max (6). Pure jnp — fuses into the
    surrounding jit; exact same per-ray ops as the kernel's object-space
    transform, reduced over each tile."""
    ox, oy, oz, dx, dy, dz = tiled
    n_tiles = ox.shape[0]
    o = jnp.stack([ox, oy, oz], axis=-1).reshape(n_tiles, TILE, 3)
    d = jnp.stack([dx, dy, dz], axis=-1).reshape(n_tiles, TILE, 3)
    quat = T.euler2quat(scene.inst_pose[:, 3:6])  # [I, 4]
    pos = scene.inst_pose[:, 0:3]
    inv_scale = scene.inst_inv_scale

    def per_instance(q, p, s):
        od = T.apply_quat(q, d) * s  # [n_tiles, TILE, 3]
        oo = T.apply_quat(q, o - p) * s
        tiny = 1e-30
        safe = jnp.where(jnp.abs(od) < tiny,
                         jnp.where(od < 0, -tiny, tiny), od)
        inv = 1.0 / safe

        def lohi(v):
            lo = jnp.min(v, axis=1)
            hi = jnp.max(v, axis=1)
            lo = lo - (jnp.abs(lo) * _FRUSTUM_REL + _FRUSTUM_ABS)
            hi = hi + (jnp.abs(hi) * _FRUSTUM_REL + _FRUSTUM_ABS)
            return lo, hi

        oo_lo, oo_hi = lohi(oo)
        inv_lo, inv_hi = lohi(inv)
        return jnp.concatenate([oo_lo, oo_hi, inv_lo, inv_hi], axis=-1)

    tab = jax.vmap(per_instance)(quat, pos, inv_scale)  # [I, n_tiles, 12]
    return tab.transpose(1, 0, 2).astype(jnp.float32)


def _image_to_tiles(arr: jax.Array) -> jax.Array:
    """[H, W] -> [n_tiles, TILE_S, TILE_L] where each tile is one
    PIX_H x PIX_W pixel block (coherent packets)."""
    h, w = arr.shape
    a = arr.reshape(h // PIX_H, PIX_H, w // PIX_W, PIX_W)
    a = a.transpose(0, 2, 1, 3).reshape(-1, TILE_S, TILE_L)
    return a


def _tiles_to_image(tiles: jax.Array, h: int, w: int) -> jax.Array:
    a = tiles.reshape(h // PIX_H, w // PIX_W, PIX_H, PIX_W)
    return a.transpose(0, 2, 1, 3).reshape(h, w)


def _stats_enabled() -> bool:
    return os.environ.get("TRT_KERNEL_STATS", "0") == "1"


def _run_kernel(scene: SceneArrays, tiled, interpret: bool, frustum: bool,
                bf16_box: bool, worigin=None, occlusion: bool = False):
    """Invoke the pallas traversal over [n_tiles, TILE_S, 128] ray
    tiles, one tile per grid step. ``worigin`` (a [3] world origin)
    selects the uniform-origin specialization: ``tiled`` then carries
    only the three direction arrays."""
    uniform_o = worigin is not None
    if uniform_o:
        dx, dy, dz = tiled
    else:
        ox, oy, oz, dx, dy, dz = tiled
    n_tiles = dx.shape[0]
    # control words fit SMEM for most resident-scene sizes (<=~50k
    # nodes): the scalar core then reads codes directly — no vector
    # fetch, no staging store (popk smem_codes path)
    smem_codes = scene.node_child_a.shape[0] * 4 <= SMEM_CODE_BUDGET
    (inst_tab, inst_root), node_arrays, tri_arrays = _scene_kernel_inputs(
        scene, bf16_box=bf16_box and not frustum, smem_codes=smem_codes
    )
    with_stats = _stats_enabled()
    frust_tab = (
        _frustum_table(scene, tiled)
        if frustum
        else jnp.zeros((n_tiles, scene.num_instances, 12), jnp.float32)
    )

    ray_spec = pl.BlockSpec(
        (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vmem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    smem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    frust_spec = pl.BlockSpec(
        (1, scene.num_instances, 12),
        lambda i: (i, 0, 0),
        memory_space=pltpu.SMEM,
    )

    if uniform_o:
        wo = jnp.asarray(worigin, jnp.float32)
        inputs = (inst_tab, inst_root, frust_tab, wo,
                  dx, dy, dz, *node_arrays, *tri_arrays)
        code_spec = smem_whole if smem_codes else vmem_whole
        in_specs = (
            [smem_whole(inst_tab), smem_whole(inst_root), frust_spec,
             smem_whole(wo)]
            + [ray_spec] * 3
            + [code_spec(node_arrays[0]), vmem_whole(node_arrays[1])]
            + [vmem_whole(a) for a in tri_arrays]
        )
    else:
        inputs = (inst_tab, inst_root, frust_tab,
                  ox, oy, oz, dx, dy, dz, *node_arrays, *tri_arrays)
        code_spec = smem_whole if smem_codes else vmem_whole
        in_specs = (
            [smem_whole(inst_tab), smem_whole(inst_root), frust_spec]
            + [ray_spec] * 6
            + [code_spec(node_arrays[0]), vmem_whole(node_arrays[1])]
            + [vmem_whole(a) for a in tri_arrays]
        )
    f32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32)
    i32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32)
    out_shape = (f32s, i32s, i32s) + ((i32s, i32s) if with_stats else ())
    kernel = functools.partial(
        _traversal_kernel, scene.num_instances, with_stats, frustum,
        bf16_box and not frustum, uniform_o, smem_codes, occlusion,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(ray_spec,) * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_SMEM_SLOTS,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if with_stats:
        t, tri, inst, pops, tests = outs
        _LAST_STATS["pops"] = pops[:, 0, 0]
        _LAST_STATS["tests"] = tests[:, 0, 0]
    else:
        t, tri, inst = outs
    return t, tri, inst


_LAST_STATS: dict = {}


def last_stats():
    """Per-tile (pops, tri tests) from the most recent stats-enabled
    cast (TRT_KERNEL_STATS=1)."""
    return _LAST_STATS.get("pops"), _LAST_STATS.get("tests")


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# VMEM budget for the scene tables (triangle records dominate at 64B/tri
# + node records + code words). The pallas_call raises the compiler's
# default 16MB scoped-VMEM limit to 100MB (v5e has 128MB physical
# VMEM), so Sponza-class scenes stay on the fast kernel; beyond this,
# fall back to the XLA gather backend until an HBM-paging traversal
# variant exists.
VMEM_SCENE_BUDGET = 80 * 1024 * 1024


def _scene_vmem_bytes(scene: SceneArrays) -> int:
    tri_rows = -(-scene.num_triangles // REC_PER_ROW) + 1
    node_rows = -(-scene.node_child_a.shape[0] // REC_PER_ROW)
    code_rows = -(-scene.node_child_a.shape[0] // TILE_L)
    return (tri_rows + node_rows) * TILE_L * 4 + code_rows * TILE_L * 4


def _dual_default() -> bool:
    """TRT_DUAL=0 disables the dual-tile interleaved kernel
    (kernels/dual.py) — two independent packet traversals per grid step
    sharing each scalar sync. Default ON since the r3 A/B: 152.7 vs
    145.1 Mrays/s on the 82k-tri 1080p flagship (separate leaf loops;
    the fused-leaf variant measured 130.4 and stays off)."""
    return os.environ.get("TRT_DUAL", "1") != "0"


def _tlas_default() -> bool:
    """TRT_TLAS=0 disables the two-level TLAS routing for
    multi-instance scenes (kernels/tlas.py)."""
    return os.environ.get("TRT_TLAS", "1") != "0"


def _frustum_default() -> bool:
    # Measured on the 82k-tri 1080p config (v11): the interval test cuts
    # per-pop vector work ~10x but loses per-ray t-pruning (packet cap =
    # max t_best, which is BIG for any tile containing a sky ray):
    # pops 52->87, tri tests 138->309, net 125 -> 85 Mrays/s. Kept as an
    # A/B option; the dense per-ray test stays the default.
    return os.environ.get("TRT_FRUSTUM", "0") == "1"


def _bf16_default() -> bool:
    return os.environ.get("TRT_BF16_BOX", "0") == "1"


def cast_rays_pallas(scene: SceneArrays, origin, directions, interpret=None,
                     frustum=None, bf16_box=None, occlusion=False,
                     want_normals=False):
    """Nearest-hit query with the packet kernel. Accepts [H, W, 3]
    directions (tiled as PIX_H x PIX_W coherent pixel blocks) or flat
    [..., 3] (chunked linearly). Returns the same Hit record as the XLA
    backends.

    ``frustum`` selects the packet-interval box test (A/B option, off by
    default — see _frustum_default) and ``bf16_box`` the conservative
    bf16 slab test; TRT_FRUSTUM=1 / TRT_BF16_BOX=1 flip the defaults.

    Scenes whose packed tables exceed the VMEM budget route to the
    HBM-paged packet kernel automatically (kernels/paged.py) — the
    tables ride on ``scene.paged`` (attached by Scene.compile) or are
    built on the spot when the call is eager.
    """
    from ..render.renderer import Hit  # local: avoids cycle

    if _scene_vmem_bytes(scene) > VMEM_SCENE_BUDGET:
        from .paged import cast_rays_paged, prepare_paged

        tables = scene.paged
        if tables is None:
            if isinstance(scene.node_child_a, jax.core.Tracer):
                raise ValueError(
                    "scene exceeds the resident kernel's VMEM budget and "
                    "has no paging tables; attach them before jit with "
                    "scene.with_paging() (Scene.compile does this "
                    "automatically)"
                )
            tables = prepare_paged(scene)
        return cast_rays_paged(
            scene, tables, origin, directions, interpret=interpret
        )
    if interpret is None:
        interpret = not _on_tpu()
    if frustum is None:
        frustum = _frustum_default()
    if bf16_box is None:
        bf16_box = _bf16_default()
    if (
        scene.tlas is not None
        and scene.num_instances >= 2
        and _tlas_default()
        and not (frustum or bf16_box)
    ):
        from .tlas import cast_rays_tlas

        return cast_rays_tlas(scene, origin, directions,
                              interpret=interpret, occlusion=occlusion,
                              want_normals=want_normals)
    if _dual_default() and not (frustum or bf16_box):
        from .dual import cast_rays_dual

        return cast_rays_dual(scene, origin, directions,
                              interpret=interpret, occlusion=occlusion,
                              want_normals=want_normals)
    directions = jnp.asarray(directions, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    # Static uniform-origin detection: generate_rays returns a single
    # [3] camera origin for primary rays — the kernel then keeps every
    # origin-dependent intermediate as scalar/row math (no origin ray
    # tiles at all). The frustum A/B variant builds its table from
    # per-tile origin bounds, so it keeps the broadcast path.
    uniform_o = origin.ndim == 1 and not frustum
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
        t, tri, inst = _run_kernel(
            scene, tiled, interpret, frustum, bf16_box, worigin,
            occlusion,
        )
        return Hit(
            t=_tiles_to_image(t, h, w),
            tri=_tiles_to_image(tri, h, w),
            inst=_tiles_to_image(inst, h, w),
        )

    flat_d = directions.reshape(-1, 3)
    r = flat_d.shape[0]
    pad = (-r) % TILE
    if pad:
        flat_d = jnp.concatenate([flat_d, jnp.broadcast_to(flat_d[-1:], (pad, 3))])
    srcs = [(flat_d, 0), (flat_d, 1), (flat_d, 2)]
    if not uniform_o:
        flat_o = origin.reshape(-1, 3)
        if pad:
            flat_o = jnp.concatenate(
                [flat_o, jnp.broadcast_to(flat_o[-1:], (pad, 3))]
            )
        srcs = [(flat_o, 0), (flat_o, 1), (flat_o, 2)] + srcs
    tiled = tuple(a[:, c].reshape(-1, TILE_S, TILE_L) for a, c in srcs)
    t, tri, inst = _run_kernel(
        scene, tiled, interpret, frustum, bf16_box, worigin, occlusion
    )
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return Hit(t=unpack(t), tri=unpack(tri), inst=unpack(inst))
