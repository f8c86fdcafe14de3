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
pops do not amortize; this is built for the 4096-ray regime.
A/B gate: TRT_WIDE4=1 routes cast_rays_pallas here (single-instance
scenes; wide tables attach at Scene.compile).
"""

from __future__ import annotations

import dataclasses
import functools
import os

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
    make_test_tri,
    LEAF_UNROLL,
    MAX_LEAF_TRIS,
    NUDGE,
    PARALLEL_EPS,
    PIX_H,
    PIX_W,
    REC_LANES,
    REC_PER_ROW,
    SMEM_CODE_BUDGET,
    STACK_SIZE,
    TILE,
    TILE_L,
    TILE_S,
    _FLT_MAX,
    _image_to_tiles,
    _quat_rot,
    _scene_kernel_inputs,
    _stats_enabled,
    _tiles_to_image,
    T,
)

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


def _wide4_kernel(num_instances, with_stats, uniform_o, occlusion, *refs):
    (
        inst_tab_ref,  # SMEM [I, 12] f32
        inst_root_ref,  # SMEM [I] i32 wide root per instance
        wcode_ref,  # SMEM [4*W] i32
    ) = refs[:3]
    refs = refs[3:]
    if uniform_o:
        worigin_ref = refs[0]
        dx_ref, dy_ref, dz_ref = refs[1:4]
        refs = refs[4:]
        ox_ref = oy_ref = oz_ref = None
    else:
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = refs[:6]
        refs = refs[6:]
    wnodef_ref, trif_ref = refs[:2]
    rest = refs[2:]
    if with_stats:
        t_out_ref, tri_out_ref, inst_out_ref, pops_ref, tests_ref, smem_ref = rest
    else:
        t_out_ref, tri_out_ref, inst_out_ref, smem_ref = rest

    lane16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 0)
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 1)
    sub32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 0)

    def fetch32(k):
        """One 32-field wide-node record as [32, 128] broadcast rows."""
        row = wnodef_ref[pl.ds(k // REC32_PER_ROW, 1), :]
        rep = jnp.broadcast_to(row, (REC32, TILE_L))
        mask = lane32 == (k % REC32_PER_ROW) * REC32 + sub32
        vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
        return vals + jnp.zeros((REC32, TILE_L), jnp.float32)

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

        wdx, wdy, wdz = dirs
        odx, ody, odz = _quat_rot(qw, qx, qy, qz, wdx, wdy, wdz)
        odx, ody, odz = odx * sx, ody * sy, odz * sz
        if uniform_o:
            wox = worigin_ref[0]
            woy = worigin_ref[1]
            woz = worigin_ref[2]
        else:
            wox, woy, woz = origs
        oox, ooy, ooz = _quat_rot(qw, qx, qy, qz, wox - px, woy - py, woz - pz)
        oox, ooy, ooz = oox * sx, ooy * sy, ooz * sz

        def _inv(v):
            tiny = 1e-30
            safe = jnp.where(jnp.abs(v) < tiny,
                             jnp.where(v < 0, -tiny, tiny), v)
            return 1.0 / safe

        idx_, idy_, idz_ = _inv(odx), _inv(ody), _inv(odz)

        def child_entry(rec, c, t_cap):
            base = 6 * c
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

        test_tri = make_test_tri(
            (oox, ooy, ooz), (odx, ody, odz),
            None if num_instances == 1 else i, occlusion,
        )

        def popk(sp, t_b):
            """Pop up to POP_KW wide nodes per sync. Vector phase packs
            one word per pop: hit count + near-first child permutation;
            scalar phase reads the four child codes SMEM-direct and
            pushes/collects in distance order."""
            nodes, acts = [], []
            spm = sp
            for j in range(POP_KW):
                acts.append((sp > j).astype(jnp.int32))
                nodes.append(smem_ref[jnp.maximum(sp - 1 - j, 0)])
                spm = spm - acts[j]

            # --- vector phase ---
            for j in range(POP_KW):
                rec = fetch32(nodes[j])
                ds = [child_entry(rec, c, t_b) for c in range(4)]
                hs = [(d < BIG).astype(jnp.int32) for d in ds]
                count = hs[0] + hs[1] + hs[2] + hs[3]
                # rank_c among all 4 by (distance, index); misses carry
                # BIG so they rank last and the first `count` slots of
                # the permutation are exactly the hit children
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
                    # child c occupies permutation slot r
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
                    code = wcode_ref[4 * node + csel]
                    is_int = ((code >= 0).astype(jnp.int32)) * active
                    # push internal children farthest-first (slot above
                    # the stack top is scratch when not pushed; clamped
                    # so scratch writes never leave a negative id)
                    smem_ref[sp_out] = jnp.maximum(code, 0)
                    sp_out = sp_out + is_int
                    packed = -code - 1
                    lcount = (packed & MAX_LEAF_TRIS) * (active - is_int)
                    pop_leaves.append((packed >> LEAF_BITS, lcount))
                leaf.extend(pop_leaves[::-1])  # nearest-first
            pops = acts[0]
            for a in acts[1:]:
                pops = pops + a
            return sp_out, leaf, pops

        def leaf_loop(start, count, st):
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
                    rec = vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)
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
        in_b = jnp.where(tri_b >= 0, 0, in_b)
    t_out_ref[0] = jnp.where(t_b >= BIG, _FLT_MAX, t_b)
    tri_out_ref[0] = tri_b
    inst_out_ref[0] = in_b
    if with_stats:
        zeros = jnp.zeros((TILE_S, TILE_L), jnp.int32)
        pops_ref[0] = zeros + n_pops
        tests_ref[0] = zeros + n_tests


def _run_wide4(scene: SceneArrays, tables: Wide4Tables, tiled, interpret,
               worigin=None, occlusion=False):
    uniform_o = worigin is not None
    dx = tiled[0] if uniform_o else tiled[3]
    n_tiles = dx.shape[0]
    (inst_tab, _), (_, _), (trif,) = _scene_kernel_inputs(
        scene, bf16_box=False, smem_codes=True
    )
    inst_root = tables.wroot[scene.inst_mesh]
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

    head = (inst_tab, inst_root, tables.wcode)
    head_specs = [smem_whole(a) for a in head]
    if uniform_o:
        wo = jnp.asarray(worigin, jnp.float32)
        inputs = head + (wo, *tiled, tables.wnodef, trif)
        in_specs = (
            head_specs + [smem_whole(wo)] + [ray_spec] * 3
            + [vmem_whole(tables.wnodef), vmem_whole(trif)]
        )
    else:
        inputs = head + (*tiled, tables.wnodef, trif)
        in_specs = (
            head_specs + [ray_spec] * 6
            + [vmem_whole(tables.wnodef), vmem_whole(trif)]
        )
    f32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32)
    i32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32)
    out_shape = (f32s, i32s, i32s) + ((i32s, i32s) if with_stats else ())
    kernel = functools.partial(
        _wide4_kernel, scene.num_instances, with_stats, uniform_o,
        occlusion,
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
        from .traversal import _LAST_STATS

        _LAST_STATS["pops"] = pops[:, 0, 0]
        _LAST_STATS["tests"] = tests[:, 0, 0]
    else:
        t, tri, inst = outs
    return t, tri, inst


def cast_rays_wide4(scene: SceneArrays, origin, directions, interpret=None,
                    occlusion=False):
    """Nearest-hit query with the 4-wide packet kernel. Requires
    scene.wide4 (attached at Scene.compile). Same Hit record and
    ray-layout handling as cast_rays_pallas."""
    from ..render.renderer import Hit  # local: avoids cycle

    tables = scene.wide4
    if tables is None:
        raise ValueError("scene has no wide4 tables")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
        t, tri, inst = _run_wide4(scene, tables, tiled, interpret, worigin,
                           occlusion)
        return Hit(
            t=_tiles_to_image(t, h, w),
            tri=_tiles_to_image(tri, h, w),
            inst=_tiles_to_image(inst, h, w),
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
    t, tri, inst = _run_wide4(scene, tables, tiled, interpret, worigin,
                           occlusion)
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return Hit(t=unpack(t), tri=unpack(tri), inst=unpack(inst))
