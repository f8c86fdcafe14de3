"""Two-level (TLAS over instances -> per-mesh BLAS) packet traversal.

The reference loops over instances LINEARLY inside cast_ray
(raycast.cu:26-51): every ray pays every instance's BVH walk. The
resident packet kernel mirrors that (an unrolled python loop over
instances, kernels/traversal.py) — measured 39 vs 141 Mrays/s on a
5-instance scene, because N instances cost N serial packet traversals
per tile even where most instances are occluded or off-tile.

This variant adds the acceleration level the reference lacks: a small
scene-level BVH (TLAS) over instance WORLD-space boxes, traversed with
the same packet scheme in world space; reaching a TLAS leaf enters the
instance's object space (dynamic instance id — per-instance scalars
are SMEM rows read at a traced index) and runs the standard BLAS packet
traversal. The per-ray best distance is shared across the whole
two-level walk, and the TLAS descends NEAR-INSTANCE-FIRST, so closer
instances occlude-prune farther ones down to one slab test — beating
the reference's linear loop structurally on multi-instance scenes.

Tie semantics: hit results are identical to the linear kernel except
when two DIFFERENT instances produce exactly equal nearest-t (the
linear loop resolves by instance index, the TLAS by spatial order) —
coplanar-overlap geometry only; all oracle scenes are unaffected.
The reference's rule is strict-``<`` first-tested-wins in instance
order (raycast.cu:104-113); every kernel here keeps the strict ``<``
accept, so ties always resolve to SOME valid hit at the tied t, but
WHICH one follows visit order — and visit order depends on packet
membership, so tri/inst ids at exact ties may differ between packet
geometries (kernels/family.py) or after any tree change. Never
distance-visible; tests/test_kernel_family.py oracles this.

TLAS tables ride on ``SceneArrays.tlas`` (built at compile / refreshed
by update_instance on concrete arrays). A/B gate: TRT_TLAS=0 disables
the routing in cast_rays_pallas.

Dynamic-instance-count support is structural: the linear kernel unrolls
a python loop (static instance count baked into the executable); here
instance count is runtime data, so scenes can add/remove instances
without recompiling the kernel.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import SceneArrays
from .traversal import (
    BIG,
    EDGE_EPS,
    LEAF_BITS,
    LEAF_SHIFT,
    LEAF_UNROLL,
    MAX_LEAF_TRIS,
    NUDGE,
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
    _image_to_tiles,
    _pack_records,
    _quat_rot,
    _scene_kernel_inputs,
    _stats_enabled,
    _tiles_to_image,
    make_test_tri,
    T,
)

TLAS_STACK = 48  # instance trees are shallow (depth ~ log2(I) + slack)

# SMEM scratch: TLAS stack | BLAS stack | TLAS push slot | POP_K code +
# POP_K push slots for the BLAS loop. The BLAS stack region is sized
# for the WIDE path (4-wide fronts are ~3x the binary front,
# kernels/wide4.py); the binary path uses a prefix.
from .wide4 import POP_KW, REC32, REC32_PER_ROW, STACK_W  # noqa: E402

_BSTACK = TLAS_STACK
_S_TPUSH = TLAS_STACK + STACK_W
_S_CODE = _S_TPUSH + 1
_S_PUSH = _S_CODE + max(POP_K, 4 * POP_KW)
_SMEM_SLOTS = _S_PUSH + max(POP_K, POP_KW)

# Triangles per wide-path leaf iteration (the dual kernel's LEAF_U=16
# default, +6% there: one 2-row iteration covers a min_leaf=16 leaf)
import os as _os  # noqa: E402

LEAF_UW = int(_os.environ.get("TRT_TLAS_LEAF_U", "16"))
assert LEAF_UW % LEAF_UNROLL == 0


def _tlas_wide_default() -> bool:
    return _os.environ.get("TRT_TLAS_WIDE", "1") != "0"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TlasTables:
    """Scene-level BVH over instance world boxes (a tiny pytree that
    rides on SceneArrays.tlas through jit boundaries)."""

    code: jax.Array  # [Nt] i32: internal -> child_b; leaf -> -(start*1024+count)-1
    nodef: jax.Array  # [ceil(Nt/8), 128] f32 packed child-box records (world)
    inst_ids: jax.Array  # [I] i32: TLAS leaf position -> instance id


def build_tlas(scene: SceneArrays) -> TlasTables:
    """Eager host build (concrete arrays only): world-space AABB per
    instance = the instance transform applied to its mesh root box
    corners (conservative — includes the compile-time box pad), then
    the standard SAH builder over those boxes (leaves of 1)."""
    mr = np.asarray(scene.mesh_root)[np.asarray(scene.inst_mesh)]
    bmin = np.asarray(scene.node_min)[mr]  # [I, 3] object-space root box
    bmax = np.asarray(scene.node_max)[mr]
    inv_pose = jnp.asarray(scene.inst_inv_pose)
    scale = jnp.asarray(scene.inst_scale)

    # 8 corners -> world = apply_lre(inv_pose, corner * scale)
    # (hit_attributes' object->world convention, raycast.cu:98-102)
    sel = np.array(
        [[(c >> a) & 1 for a in range(3)] for c in range(8)], np.float32
    )  # [8, 3] of 0/1
    corners = bmin[:, None, :] * (1.0 - sel) + bmax[:, None, :] * sel
    world = np.asarray(
        T.apply_lre(inv_pose[:, None, :], jnp.asarray(corners) * scale[:, None, :])
    )
    wmin = world.min(axis=1).astype(np.float32)
    wmax = world.max(axis=1).astype(np.float32)

    from ..accel.bvh import build_bvh

    # the builder grows node boxes over all three "vertex" arrays, so
    # feeding (min-corner, max-corner, center) yields exact AABB unions
    # with centroid splits at box centers
    bvh = build_bvh(wmin, wmax, (wmin + wmax) * 0.5, max_depth=32,
                    min_leaf_size=1)
    if bvh.leaf_count.max(initial=0) > MAX_LEAF_TRIS:
        raise ValueError("TLAS leaf exceeds the 10-bit count field")
    internal = bvh.child_a >= 0
    idx = np.nonzero(internal)[0]
    if not (bvh.child_a[idx] == idx + 1).all():
        raise ValueError("TLAS not DFS preorder")

    packed_leaf = bvh.leaf_start * LEAF_SHIFT + bvh.leaf_count
    code = np.where(internal, bvh.child_b, -packed_leaf - 1).astype(np.int32)

    ca = np.maximum(bvh.child_a, 0)
    cb = np.maximum(bvh.child_b, 0)
    fields = []
    for c in (ca, cb):
        mn = bvh.node_min[c] - NUDGE
        mx = bvh.node_max[c] + NUDGE
        fields += [mn[:, 0], mn[:, 1], mn[:, 2], mx[:, 0], mx[:, 1], mx[:, 2]]
    nodef = _pack_records([jnp.asarray(f) for f in fields], bvh.num_nodes)
    return TlasTables(
        code=jnp.asarray(code),
        nodef=nodef,
        inst_ids=jnp.asarray(bvh.order.astype(np.int32)),
    )


def _tlas_kernel(with_stats, uniform_o, smem_codes, wide, tri_rows,
                 occlusion, carry_uv, carry_n, *refs):
    (
        inst_tab_ref,  # SMEM [I, 12] f32 quat/pos/inv_scale
        inst_root_ref,  # SMEM [I] i32 BLAS root node per instance
        tlas_code_ref,  # SMEM [Nt] i32 TLAS control words
        tlas_inst_ref,  # SMEM [I] i32 leaf position -> instance id
    ) = refs[:4]
    refs = refs[4:]
    if uniform_o:
        worigin_ref = refs[0]
        dx_ref, dy_ref, dz_ref = refs[1:4]
        refs = refs[4:]
        ox_ref = oy_ref = oz_ref = None
    else:
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = refs[:6]
        refs = refs[6:]
    tlas_nodef_ref, code_ref, nodef_ref, trif_ref = refs[:4]
    rest = refs[4:]
    n_extra = (2 if carry_uv else 0) + (3 if carry_n else 0)
    extra_out_refs = ()
    if n_extra:
        extra_out_refs = rest[3:3 + n_extra]
        rest = rest[:3] + rest[3 + n_extra:]
    if with_stats:
        t_out_ref, tri_out_ref, inst_out_ref, pops_ref, tests_ref, smem_ref = rest
    else:
        t_out_ref, tri_out_ref, inst_out_ref, smem_ref = rest

    lane16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 1)
    sub32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 0)

    def fetch_record(ref, k):
        row = ref[pl.ds(k // REC_PER_ROW, 1), :]
        rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
        mask = lane16 == (k % REC_PER_ROW) * REC_LANES + sub16
        vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
        return vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)

    def fetch_record32(ref, k):
        """One 32-field wide-node record as [32, 128] broadcast rows
        (kernels/wide4.py fetch32)."""
        row = ref[pl.ds(k // REC32_PER_ROW, 1), :]
        rep = jnp.broadcast_to(row, (REC32, TILE_L))
        mask = lane32 == (k % REC32_PER_ROW) * REC32 + sub32
        vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
        return vals + jnp.zeros((REC32, TILE_L), jnp.float32)

    def _inv(v):
        tiny = 1e-30
        safe = jnp.where(jnp.abs(v) < tiny,
                         jnp.where(v < 0, -tiny, tiny), v)
        return 1.0 / safe

    wdx, wdy, wdz = (r[0] for r in (dx_ref, dy_ref, dz_ref))
    widx, widy, widz = _inv(wdx), _inv(wdy), _inv(wdz)
    if uniform_o:
        wox = worigin_ref[0]
        woy = worigin_ref[1]
        woz = worigin_ref[2]
    else:
        wox, woy, woz = (r[0] for r in (ox_ref, oy_ref, oz_ref))

    def slab_entry(rec, base, t_cap, oox, ooy, ooz, idx_, idy_, idz_):
        """Packet slab test (shared by the world-space TLAS tests and
        the object-space BLAS tests) — op-identical to the resident
        kernel's non-FMA packet_entry."""
        bminx = rec[base + 0 : base + 1, :]
        bminy = rec[base + 1 : base + 2, :]
        bminz = rec[base + 2 : base + 3, :]
        bmaxx = rec[base + 3 : base + 4, :]
        bmaxy = rec[base + 4 : base + 5, :]
        bmaxz = rec[base + 5 : base + 6, :]
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

    def traverse_instance(i, st):
        """Object-space BLAS packet traversal of instance ``i`` (a
        TRACED index — per-instance scalars come from SMEM rows). Same
        popk/leaf scheme as the resident kernel."""
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

        odx, ody, odz = _quat_rot(qw, qx, qy, qz, wdx, wdy, wdz)
        odx, ody, odz = odx * sx, ody * sy, odz * sz
        oox, ooy, ooz = _quat_rot(qw, qx, qy, qz, wox - px, woy - py, woz - pz)
        oox, ooy, ooz = oox * sx, ooy * sy, ooz * sz
        idx_, idy_, idz_ = _inv(odx), _inv(ody), _inv(odz)

        # ``i`` is TRACED here (TLAS leaves pick the instance at
        # runtime), so instance tracking is always on
        test_tri = make_test_tri((oox, ooy, ooz), (odx, ody, odz), i,
                                 occlusion, carry_uv=carry_uv,
                                 carry_n=carry_n)

        def popk_wide(sp, t_b):
            """4-WIDE BLAS pops (kernels/wide4.py popk with the BLAS
            stack region): POP_KW wide pops per combined scalar stall,
            child codes read SMEM-direct from the wide control table,
            rank-ordered near-first sibling pushes."""
            nodes, acts = [], []
            spm = sp
            for j in range(POP_KW):
                acts.append((sp > j).astype(jnp.int32))
                nodes.append(smem_ref[_BSTACK + jnp.maximum(sp - 1 - j, 0)])
                spm = spm - acts[j]

            # --- vector phase ---
            for j in range(POP_KW):
                rec = fetch_record32(nodef_ref, nodes[j])
                ds = [
                    slab_entry(rec, 6 * c, t_b, oox, ooy, ooz,
                               idx_, idy_, idz_)
                    for c in range(4)
                ]
                hs = [(d < BIG).astype(jnp.int32) for d in ds]
                count = hs[0] + hs[1] + hs[2] + hs[3]
                word = count
                for c in range(4):
                    r = jnp.int32(0)
                    for k in range(4):
                        if k == c:
                            continue
                        r = r + (
                            (ds[k] < ds[c])
                            | ((ds[k] == ds[c]) & (k < c))
                        ).astype(jnp.int32)
                    word = word + jnp.left_shift(jnp.int32(c), 3 + 2 * r)
                smem_ref[_S_PUSH + j] = word

            # --- scalar phase (one combined stall) ---
            sp_out = spm
            leaf = []
            for j in reversed(range(POP_KW)):
                node, act = nodes[j], acts[j]
                w_ = smem_ref[_S_PUSH + j]
                count = (w_ & 7) * act
                pop_leaves = []
                for p in reversed(range(4)):  # farthest -> nearest
                    csel = (w_ >> (3 + 2 * p)) & 3
                    active = (count > p).astype(jnp.int32)
                    code = code_ref[4 * node + csel]
                    is_int = ((code >= 0).astype(jnp.int32)) * active
                    # scratch writes above the stack top stay valid ids
                    smem_ref[_BSTACK + sp_out] = jnp.maximum(code, 0)
                    sp_out = sp_out + is_int
                    packed = -code - 1
                    lcount = (packed & MAX_LEAF_TRIS) * (active - is_int)
                    pop_leaves.append((packed >> LEAF_BITS, lcount))
                leaf.extend(pop_leaves[::-1])  # nearest-first
            pops = acts[0]
            for a in acts[1:]:
                pops = pops + a
            return sp_out, leaf, pops

        def leaf_loop_wide(start, count, acc):
            """LEAF_UW-triangle iterations: LEAF_UW/8 independent row
            loads per fori step (kernels/dual.py LEAF_U pattern;
            overshoot rows clamped, tests masked by count)."""
            def row_tests(kr, count_end, acc):
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
                    acc = test_tri(rec, k, k < count_end, *acc)
                return acc

            n_rows = LEAF_UW // LEAF_UNROLL

            def quad_body(q, acc):
                k0 = start + q * LEAF_UW
                for r_ in range(n_rows):
                    acc = row_tests(k0 + r_ * REC_PER_ROW, start + count, acc)
                return acc

            n_quads = (count + LEAF_UW - 1) // LEAF_UW
            return jax.lax.fori_loop(0, n_quads, quad_body, acc)

        def popk(sp, t_b):
            nodes, acts = [], []
            spm = sp
            for j in range(POP_K):
                acts.append((sp > j).astype(jnp.int32))
                nodes.append(smem_ref[_BSTACK + jnp.maximum(sp - 1 - j, 0)])
                spm = spm - acts[j]

            for j in range(POP_K):
                node = nodes[j]
                if not smem_codes:
                    crow = code_ref[pl.ds(node // TILE_L, 1), :]
                    smem_ref[_S_CODE + j] = jnp.sum(
                        jnp.where(lane1 == node % TILE_L, crow, 0)
                    )
                rec = fetch_record(nodef_ref, node)
                da = slab_entry(rec, 0, t_b, oox, ooy, ooz, idx_, idy_, idz_)
                db = slab_entry(rec, 6, t_b, oox, ooy, ooz, idx_, idy_, idz_)
                smem_ref[_S_PUSH + j] = (
                    (da <= db).astype(jnp.int32)
                    + 2 * (da < BIG).astype(jnp.int32)
                    + 4 * (db < BIG).astype(jnp.int32)
                )

            sp_out = spm
            leaf = []
            for j in reversed(range(POP_K)):
                node, act = nodes[j], acts[j]
                if smem_codes:
                    code = code_ref[node]
                else:
                    code = smem_ref[_S_CODE + j]
                is_int = ((code >= 0).astype(jnp.int32)) * act
                ca = node + 1
                cb = jnp.maximum(code, 0)
                w_ = smem_ref[_S_PUSH + j] * is_int
                a_first = 1 - (w_ & 1)
                pa = (w_ >> 1) & 1
                pb = (w_ >> 2) & 1
                first = jnp.where(a_first == 1, ca, cb)
                p_first = jnp.where(a_first == 1, pa, pb)
                second = jnp.where(a_first == 1, cb, ca)
                p_second = jnp.where(a_first == 1, pb, pa)
                smem_ref[_BSTACK + sp_out] = first
                sp_out = sp_out + p_first
                smem_ref[_BSTACK + sp_out] = second
                sp_out = sp_out + p_second
                packed = -code - 1
                start = packed >> LEAF_BITS
                leaf_flag = act - is_int
                count = (packed & MAX_LEAF_TRIS) * leaf_flag
                leaf.append((start, count))
            pops = acts[0]
            for a in acts[1:]:
                pops = pops + a
            return sp_out, leaf[::-1], pops

        def leaf_loop(start, count, acc):
            def quad_body(q, acc):
                k0 = start + q * LEAF_UNROLL
                row = trif_ref[pl.ds(k0 // REC_PER_ROW, 1), :]
                rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
                for u_ in range(LEAF_UNROLL):
                    k = k0 + u_
                    mask = lane16 == u_ * REC_LANES + sub16  # static
                    vals = jnp.sum(
                        jnp.where(mask, rep, 0.0), axis=1, keepdims=True
                    )
                    rec = vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)
                    acc = test_tri(rec, k, k < start + count, *acc)
                return acc

            n_quads = (count + LEAF_UNROLL - 1) // LEAF_UNROLL
            return jax.lax.fori_loop(0, n_quads, quad_body, acc)

        pop_fn = popk_wide if wide else popk
        leaf_fn = leaf_loop_wide if wide else leaf_loop

        def body(carry):
            sp, state, np_, nt_ = carry
            sp, leaves, pops = pop_fn(sp, state[0])
            nt = nt_
            for s_, c_ in leaves:
                state = leaf_fn(s_, c_, state)
                nt = nt + c_
            return sp, state, np_ + pops, nt

        state, np_, nt_ = st
        smem_ref[_BSTACK] = inst_root_ref[i]
        carry = (jnp.int32(1), state, np_, nt_)
        carry = jax.lax.while_loop(lambda c: c[0] > 0, body, carry)
        return carry[1], carry[2], carry[3]

    def tlas_pop(sp, t_b):
        """Single TLAS pop: world-space slab tests of both child boxes,
        ordered near-first push (the instance-level analog of
        raycast.cu:69-79, which the reference does not have)."""
        node = smem_ref[sp - 1]
        code = tlas_code_ref[node]  # SMEM-resident, scalar-direct
        rec = fetch_record(tlas_nodef_ref, node)
        da = slab_entry(rec, 0, t_b, wox, woy, woz, widx, widy, widz)
        db = slab_entry(rec, 6, t_b, wox, woy, woz, widx, widy, widz)
        smem_ref[_S_TPUSH] = (
            (da <= db).astype(jnp.int32)
            + 2 * (da < BIG).astype(jnp.int32)
            + 4 * (db < BIG).astype(jnp.int32)
        )
        is_int = (code >= 0).astype(jnp.int32)
        ca = node + 1
        cb = jnp.maximum(code, 0)
        w_ = smem_ref[_S_TPUSH] * is_int
        a_first = 1 - (w_ & 1)
        pa = (w_ >> 1) & 1
        pb = (w_ >> 2) & 1
        first = jnp.where(a_first == 1, ca, cb)
        p_first = jnp.where(a_first == 1, pa, pb)
        second = jnp.where(a_first == 1, cb, ca)
        p_second = jnp.where(a_first == 1, pb, pa)
        sp_out = sp - 1
        smem_ref[sp_out] = first
        sp_out = sp_out + p_first
        smem_ref[sp_out] = second
        sp_out = sp_out + p_second
        return sp_out, code

    best = (
        jnp.full((TILE_S, TILE_L), BIG, jnp.float32),
        jnp.full((TILE_S, TILE_L), -1, jnp.int32),
        jnp.full((TILE_S, TILE_L), -1, jnp.int32),
    )
    for _ in range(n_extra):
        best = best + (jnp.zeros((TILE_S, TILE_L), jnp.float32),)

    def outer(c):
        sp, state, np_, nt_ = c
        sp, code = tlas_pop(sp, state[0])
        packed = -code - 1
        start = packed >> LEAF_BITS
        count = packed & MAX_LEAF_TRIS

        def leaf_case(args):
            state, np_, nt_ = args

            def per_inst(p, acc):
                return traverse_instance(tlas_inst_ref[start + p], acc)

            return jax.lax.fori_loop(
                0, count, per_inst, (state, np_, nt_)
            )

        state, np_, nt_ = jax.lax.cond(
            code < 0, leaf_case, lambda a: a, (state, np_ + 1, nt_)
        )
        return sp, state, np_, nt_

    smem_ref[0] = jnp.int32(0)  # TLAS root
    carry = (jnp.int32(1), best, jnp.int32(0), jnp.int32(0))
    carry = jax.lax.while_loop(lambda c: c[0] > 0, outer, carry)
    _, best, n_pops, n_tests = carry

    t_b, tri_b, in_b = best[:3]
    t_out_ref[0] = jnp.where(t_b >= BIG, _FLT_MAX, t_b)
    tri_out_ref[0] = tri_b
    inst_out_ref[0] = in_b
    for e in range(n_extra):
        extra_out_refs[e][0] = best[3 + e]
    if with_stats:
        zeros = jnp.zeros((TILE_S, TILE_L), jnp.int32)
        pops_ref[0] = zeros + n_pops
        tests_ref[0] = zeros + n_tests


def _run_tlas(scene: SceneArrays, tables: TlasTables, tiled, interpret,
              worigin=None, occlusion=False, carry_uv=False,
              carry_n=False):
    uniform_o = worigin is not None
    if uniform_o:
        dx = tiled[0]
    else:
        dx = tiled[3]
    n_tiles = dx.shape[0]
    smem_codes = scene.node_child_a.shape[0] * 4 <= SMEM_CODE_BUDGET
    (inst_tab, inst_root), (code_arr, nodef), (trif,) = _scene_kernel_inputs(
        scene, bf16_box=False, smem_codes=smem_codes
    )
    # 4-WIDE BLAS (kernels/wide4.py tables) when available and the wide
    # control words fit SMEM; TRT_TLAS_WIDE=0 forces the binary loop
    wide = (
        scene.wide4 is not None
        and _tlas_wide_default()
        and scene.wide4.wcode.shape[0] * 4 <= SMEM_CODE_BUDGET
    )
    if wide:
        code_arr = scene.wide4.wcode
        nodef = scene.wide4.wnodef
        inst_root = scene.wide4.wroot[scene.inst_mesh]
        smem_codes = True  # wide codes are always SMEM-resident
    with_stats = _stats_enabled()

    ray_spec = pl.BlockSpec(
        (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vmem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    smem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    code_spec = smem_whole if smem_codes else vmem_whole

    head = (inst_tab, inst_root, tables.code, tables.inst_ids)
    head_specs = [smem_whole(a) for a in head]
    if uniform_o:
        wo = jnp.asarray(worigin, jnp.float32)
        inputs = head + (wo, *tiled, tables.nodef, code_arr, nodef, trif)
        in_specs = (
            head_specs + [smem_whole(wo)] + [ray_spec] * 3
            + [vmem_whole(tables.nodef), code_spec(code_arr),
               vmem_whole(nodef), vmem_whole(trif)]
        )
    else:
        inputs = head + (*tiled, tables.nodef, code_arr, nodef, trif)
        in_specs = (
            head_specs + [ray_spec] * 6
            + [vmem_whole(tables.nodef), code_spec(code_arr),
               vmem_whole(nodef), vmem_whole(trif)]
        )
    f32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32)
    i32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32)
    n_extra = (2 if carry_uv else 0) + (3 if carry_n else 0)
    out_shape = (
        (f32s, i32s, i32s)
        + (f32s,) * n_extra
        + ((i32s, i32s) if with_stats else ())
    )
    kernel = functools.partial(
        _tlas_kernel, with_stats, uniform_o, smem_codes, wide,
        trif.shape[0], occlusion, carry_uv, carry_n,
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
    extra = ()
    if n_extra:
        extra = outs[3:3 + n_extra]
        outs = outs[:3] + outs[3 + n_extra:]
    if with_stats:
        t, tri, inst, pops, tests = outs
        from .traversal import _LAST_STATS

        _LAST_STATS["pops"] = pops[:, 0, 0]
        _LAST_STATS["tests"] = tests[:, 0, 0]
    else:
        t, tri, inst = outs
    return (t, tri, inst) + extra


def cast_rays_tlas(scene: SceneArrays, origin, directions, interpret=None,
                   occlusion=False, want_normals=False):
    """Nearest-hit query with the two-level TLAS/BLAS packet kernel.
    Requires scene.tlas (SceneArrays.with_tlas / Scene.compile). Same
    Hit record and ray-layout handling as cast_rays_pallas."""
    from ..render.renderer import Hit  # local: avoids cycle

    tables = scene.tlas
    if tables is None:
        raise ValueError("scene has no TLAS; call scene.with_tlas() first")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # ON only on real TPU by default — see cast_rays_dual's note (CPU
    # interpret contracts FMAs differently; ulp-level u/v drift)
    env_uv = _os.environ.get("TRT_CARRY_UV")
    carry_uv = (
        scene.has_textures and not occlusion
        and (env_uv == "1" if env_uv is not None else not interpret)
    )
    env_n = _os.environ.get("TRT_CARRY_N", env_uv)
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
        outs = _run_tlas(scene, tables, tiled, interpret, worigin,
                         occlusion, carry_uv, carry_n)
        from .traversal import _hit_from_outs
        return _hit_from_outs(
            Hit, tuple(_tiles_to_image(a, h, w) for a in outs),
            carry_uv, carry_n,
        )

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
    outs = _run_tlas(scene, tables, tiled, interpret, worigin,
                     occlusion, carry_uv, carry_n)
    from .traversal import _hit_from_outs
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return _hit_from_outs(Hit, tuple(unpack(a) for a in outs),
                          carry_uv, carry_n)
