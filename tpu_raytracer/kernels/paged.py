"""HBM-paged Pallas packet traversal for beyond-VMEM scenes.

The main packet kernel (kernels/traversal.py) keeps the whole packed
scene resident in VMEM and degrades to the slow XLA gather walk past
~80MB of tables. This variant matches the reference's everything-
resident behavior (Scene.cpp:41-64) at TPU scale: the full packed
tables live in HBM; a small compacted TOP TREE (accel/paging.py) is
VMEM-resident; when the packet traversal reaches a "portal leaf" of the
top tree it DMAs that page's three contiguous row slices (control
words, node records, triangle records) HBM->VMEM and traverses the
subtree in place. DFS-preorder subtree contiguity means a page is a
plain row window of the global tables — in-page fetches just subtract
the page's base row; child and triangle ids stay GLOBAL.

Per-packet cost model: coherent primary packets touch few pages (the
cut is ~2048 triangles, so an 82k-tri mesh is ~40 pages but a packet's
frustum crosses a handful); each page entry costs one ~200KB DMA
(~0.25us of HBM bandwidth on v5e) amortized over the whole subtree
traversal — and page DMAs are DOUBLE-BUFFERED (r3): while page k's
subtree is being traversed, the top-tree walk has already located
portal k+1 and its three row-slice copies are in flight into the other
buffer set, so the DMA latency hides behind in-page traversal instead
of serializing with it. Traversal order and t-pruning semantics are
identical to the main kernel (ordered near-first descent per pop,
per-ray t caps), so hit results match the brute-force oracle exactly;
only iteration granularity differs (the tiny top loop is single-pop;
in-page pops use the resident kernel's POP_K=2 packed-word sync).
The one semantic delta from single-buffering: portal k+1 is chosen
(box-tested) before page k's leaf hits can tighten t_best, so a page
that would have been pruned may still be visited — extra DMAs only,
never wrong results (in-page tests still use live per-ray t caps).

Scene-size limit: in-page leaf control words pack PAGE-LOCAL triangle
starts (global start - page_tri0, rebuilt in prepare_paged), so the
10-bit count field caps leaves, not scenes; triangle/node ids are i32,
capping paged scenes at 2^28 triangles (far beyond HBM capacity).
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

from ..accel.paging import PAGE_NODES, PAGE_TRIS, PageTable, build_page_table
from ..scene.scene import SceneArrays
from .traversal import (
    BIG,
    EDGE_EPS,
    FMA_BOX,
    LEAF_BITS,
    LEAF_SHIFT,
    LEAF_UNROLL,
    MAX_LEAF_TRIS,
    NUDGE,
    PARALLEL_EPS,
    PIX_H,
    PIX_W,
    REC_LANES,
    REC_PER_ROW,
    STACK_SIZE,
    TILE,
    TILE_L,
    TILE_S,
    _FLT_MAX,
    _image_to_tiles,
    _pack128,
    _pack_records,
    _quat_rot,
    _scene_kernel_inputs,
    _stats_enabled,
    _tiles_to_image,
    make_test_tri,
    T,
)

# Page buffer capacities in 128-lane rows (+1 row: a page's node/tri
# range need not start row-aligned, so it can span one extra row),
# rounded UP to a multiple of 8: DMAs whose sublane extent is not a
# multiple of the 8-row tile hang or fault the chip (probed on v5e —
# unaligned row OFFSETS are fine, unaligned row COUNTS are not).
def _round8(rows: int) -> int:
    return -(-rows // 8) * 8


CODE_ROWS = _round8(PAGE_NODES // TILE_L + 1)
NODE_ROWS = _round8(PAGE_NODES // REC_PER_ROW + 1)
TRI_ROWS = _round8(PAGE_TRIS // REC_PER_ROW + 1)

# SMEM layout: top stack | page stack | 2 code words | 2 push words
# (the in-page loop pops TWO nodes per scalar sync like the resident
# kernel's POP_K=2; the tiny top-tree loop stays single-pop)
_PAGE_POP_K = 2
_PSTACK = STACK_SIZE
_S_CODE = 2 * STACK_SIZE
_S_PUSH = 2 * STACK_SIZE + _PAGE_POP_K
_SMEM_SLOTS = 2 * STACK_SIZE + 2 * _PAGE_POP_K


def _paged_kernel(num_instances: int, with_stats: bool, uniform_o: bool,
                  *refs):
    if uniform_o:
        # uniform-origin specialization (see kernels/traversal.py):
        # origin ray tiles absent, world origin in SMEM
        (
            inst_tab_ref,  # SMEM [I, 12] f32 quat/pos/inv_scale
            inst_root_ref,  # SMEM [I] i32 TOP-TREE rank of the instance root
            page_tab_ref,  # SMEM [P, 2] i32 (node0, tri0) per page
            worigin_ref,  # SMEM [3] f32 world-space ray origin
            dx_ref, dy_ref, dz_ref,  # VMEM [1, TILE_S, 128] f32 ray tiles
            tcode_ref,  # VMEM [ceil(Nt/128), 128] i32 top control words
            tnodef_ref,  # VMEM [ceil(Nt/8), 128] f32 top 16-lane records
            gcode_ref,  # ANY  [*, 128] i32 global control words (HBM)
            gnodef_ref,  # ANY  [*, 128] f32 global node records (HBM)
            gtrif_ref,  # ANY  [*, 128] f32 global triangle records (HBM)
        ) = refs[:12]
        rest = refs[12:]
        ox_ref = oy_ref = oz_ref = None
    else:
        (
            inst_tab_ref,  # SMEM [I, 12] f32 quat/pos/inv_scale
            inst_root_ref,  # SMEM [I] i32 TOP-TREE rank of the instance root
            page_tab_ref,  # SMEM [P, 2] i32 (node0, tri0) per page
            ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref,  # VMEM [1, TILE_S, 128] f32 ray tiles
            tcode_ref,  # VMEM [ceil(Nt/128), 128] i32 top control words
            tnodef_ref,  # VMEM [ceil(Nt/8), 128] f32 top 16-lane records
            gcode_ref,  # ANY  [*, 128] i32 global control words (HBM)
            gnodef_ref,  # ANY  [*, 128] f32 global node records (HBM)
            gtrif_ref,  # ANY  [*, 128] f32 global triangle records (HBM)
        ) = refs[:14]
        rest = refs[14:]
    if with_stats:
        (t_out_ref, tri_out_ref, inst_out_ref, pops_ref, tests_ref,
         smem_ref, pcode_ref, pnodef_ref, ptrif_ref, sem_ref) = rest
    else:
        (t_out_ref, tri_out_ref, inst_out_ref,
         smem_ref, pcode_ref, pnodef_ref, ptrif_ref, sem_ref) = rest

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 0)

    def fetch_record(ref, k, row0):
        """One 16-field record as [16, 128] broadcast rows; ``row0`` is
        the ref's base row (0 for whole-table refs, the page's base for
        page buffers — k keeps its GLOBAL meaning either way)."""
        row = ref[pl.ds(k // REC_PER_ROW - row0, 1), :]
        rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
        mask = lane16 == (k % REC_PER_ROW) * REC_LANES + sub16
        vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
        return vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)

    def fetch_code(ref, node, row0):
        crow = ref[pl.ds(node // TILE_L - row0, 1), :]
        return jnp.sum(jnp.where(lane1 == node % TILE_L, crow, 0))

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
        fma_box = FMA_BOX and not uniform_o
        if fma_box:
            oix, oiy, oiz = oox * idx_, ooy * idy_, ooz * idz_

        def packet_entry(rec, base, t_cap):
            """Packet slab test — identical to the main kernel's
            (including the FMA_BOX form, so paged results stay
            bit-identical to the resident kernel)."""
            bminx = rec[base + 0 : base + 1, :]
            bminy = rec[base + 1 : base + 2, :]
            bminz = rec[base + 2 : base + 3, :]
            bmaxx = rec[base + 3 : base + 4, :]
            bmaxy = rec[base + 4 : base + 5, :]
            bmaxz = rec[base + 5 : base + 6, :]
            if fma_box:
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

        # identical math to the resident kernels (traversal.make_test_tri);
        # ``rec`` is extracted from the quad's shared page-buffer row
        test_tri = make_test_tri(
            (oox, ooy, ooz), (odx, ody, odz),
            None if num_instances == 1 else i,
        )

        def pop1(sp, t_b, code_ref_, nodef_ref_, crow0, nrow0, stack_base):
            """Single-node pop with the packed-word SMEM sync."""
            node = smem_ref[stack_base + sp - 1]
            smem_ref[_S_CODE] = fetch_code(code_ref_, node, crow0)
            rec = fetch_record(nodef_ref_, node, nrow0)
            da = packet_entry(rec, 0, t_b)
            db = packet_entry(rec, 6, t_b)
            smem_ref[_S_PUSH] = (
                (da <= db).astype(jnp.int32)
                + 2 * (da < BIG).astype(jnp.int32)
                + 4 * (db < BIG).astype(jnp.int32)
            )
            code = smem_ref[_S_CODE]
            is_int = (code >= 0).astype(jnp.int32)
            ca = node + 1
            cb = jnp.maximum(code, 0)
            w_ = smem_ref[_S_PUSH] * is_int
            a_first = 1 - (w_ & 1)
            pa = (w_ >> 1) & 1
            pb = (w_ >> 2) & 1
            first = jnp.where(a_first == 1, ca, cb)
            p_first = jnp.where(a_first == 1, pa, pb)
            second = jnp.where(a_first == 1, cb, ca)
            p_second = jnp.where(a_first == 1, pb, pa)
            # ordered push: farther child first, nearer on top
            # (raycast.cu:72-79; same word decode as the main kernel)
            sp_out = sp - 1
            smem_ref[stack_base + sp_out] = first
            sp_out = sp_out + p_first
            smem_ref[stack_base + sp_out] = second
            sp_out = sp_out + p_second
            return sp_out, code

        def leaf_loop(start, count, st, trow0):
            """One shared page-buffer row load per 8-triangle group
            (leaf starts are 8-aligned, scene.py leaf layout) — same
            scheme as the resident kernel's leaf_loop. ``trow0`` is the
            page's base triangle row MINUS the slot offset, so the same
            subtraction addresses either buffer half."""

            def quad_body(q, acc):
                t_b, tri_b, in_b = acc
                k0 = start + q * LEAF_UNROLL
                row = ptrif_ref[pl.ds(k0 // REC_PER_ROW - trow0, 1), :]
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

        def _page_copies(pid, slot):
            """The three HBM->VMEM row-slice copies for page ``pid``
            into buffer half ``slot``. Reconstructed at wait sites too:
            the descriptors are equivalent for semaphore accounting
            (static shapes, same per-slot semaphores)."""
            node0 = page_tab_ref[pid, 0]
            tri0 = page_tab_ref[pid, 1]
            crow0 = node0 // TILE_L
            nrow0 = node0 // REC_PER_ROW
            trow0 = tri0 // REC_PER_ROW
            return (
                pltpu.make_async_copy(
                    gcode_ref.at[pl.ds(crow0, CODE_ROWS), :],
                    pcode_ref.at[pl.ds(slot * CODE_ROWS, CODE_ROWS), :],
                    sem_ref.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    gnodef_ref.at[pl.ds(nrow0, NODE_ROWS), :],
                    pnodef_ref.at[pl.ds(slot * NODE_ROWS, NODE_ROWS), :],
                    sem_ref.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    gtrif_ref.at[pl.ds(trow0, TRI_ROWS), :],
                    ptrif_ref.at[pl.ds(slot * TRI_ROWS, TRI_ROWS), :],
                    sem_ref.at[slot, 2],
                ),
            )

        def traverse_page(pid, slot, carry):
            """Traverse page ``pid``'s subtree from buffer half ``slot``
            (its DMA already waited). Node ids stay GLOBAL; triangle
            starts in the page's control words are PAGE-LOCAL and
            rebased by + tri0 at decode."""
            node0 = page_tab_ref[pid, 0]
            tri0 = page_tab_ref[pid, 1]
            # fold the slot offset into the base-row subtraction so all
            # in-page fetches address the right buffer half
            crow0 = node0 // TILE_L - slot * CODE_ROWS
            nrow0 = node0 // REC_PER_ROW - slot * NODE_ROWS
            trow0 = tri0 // REC_PER_ROW - slot * TRI_ROWS

            smem_ref[_PSTACK] = node0

            def page_body(c):
                """TWO pops per scalar sync in-page (the resident
                kernel's POP_K=2 pattern): both nodes' codes, records
                and box tests are issued in one vector phase, then one
                combined scalar stall decodes all four SMEM words."""
                spp, state, np_, nt_ = c
                t_b = state[0]
                nodes, acts = [], []
                spm = spp
                for j in range(_PAGE_POP_K):
                    acts.append((spp > j).astype(jnp.int32))
                    nodes.append(
                        smem_ref[_PSTACK + jnp.maximum(spp - 1 - j, 0)]
                    )
                    spm = spm - acts[j]

                # vector phase: issue everything, read nothing
                for j in range(_PAGE_POP_K):
                    node = nodes[j]
                    crow = pcode_ref[pl.ds(node // TILE_L - crow0, 1), :]
                    smem_ref[_S_CODE + j] = jnp.sum(
                        jnp.where(lane1 == node % TILE_L, crow, 0)
                    )
                    rec = fetch_record(pnodef_ref, node, nrow0)
                    da = packet_entry(rec, 0, t_b)
                    db = packet_entry(rec, 6, t_b)
                    smem_ref[_S_PUSH + j] = (
                        (da <= db).astype(jnp.int32)
                        + 2 * (da < BIG).astype(jnp.int32)
                        + 4 * (db < BIG).astype(jnp.int32)
                    )

                # scalar phase: farthest pop's children pushed first
                sp_out = spm
                leaf = []
                pops = jnp.int32(0)
                for j in reversed(range(_PAGE_POP_K)):
                    node, act = nodes[j], acts[j]
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
                    smem_ref[_PSTACK + sp_out] = first
                    sp_out = sp_out + p_first
                    smem_ref[_PSTACK + sp_out] = second
                    sp_out = sp_out + p_second
                    packed = -code - 1
                    leaf_flag = act - is_int
                    # page-local start -> global (tri ids in the hit
                    # record stay global; this is what lifts the old
                    # 2^21-triangle global-start cap)
                    leaf.append((
                        (packed >> LEAF_BITS) + tri0,
                        (packed & MAX_LEAF_TRIS) * leaf_flag,
                    ))
                    pops = pops + act

                nt = nt_
                for s_, c_ in leaf[::-1]:  # nearest-first
                    state = leaf_loop(s_, c_, state, trow0)
                    nt = nt + c_
                return sp_out, state, np_ + pops, nt

            state, np_, nt_ = carry
            c = (jnp.int32(1), state, np_, nt_)
            c = jax.lax.while_loop(lambda c: c[0] > 0, page_body, c)
            return c[1], c[2], c[3]

        def next_portal(sp, t_b, np_):
            """Walk the top tree (single-pop syncs — it is tiny) until
            the next portal leaf pops or the stack empties. Returns
            (sp', page id or -1, pop count)."""

            def cond(c):
                return (c[0] > 0) & (c[1] < 0)

            def body(c):
                sp, _, np_ = c
                sp, code = pop1(sp, t_b, tcode_ref, tnodef_ref, 0, 0, 0)
                pid = jnp.where(code < 0, -code - 1, jnp.int32(-1))
                return sp, pid, np_ + 1

            return jax.lax.while_loop(
                cond, body, (sp, jnp.int32(-1), np_)
            )

        # --- double-buffered page pipeline -----------------------------
        # Find portal k+1 and launch its DMAs into the other buffer half
        # BEFORE traversing page k, so the copies ride under the in-page
        # traversal. Portal selection uses the t_best at selection time
        # (conservative superset — see module docstring).
        root = inst_root_ref[i]
        smem_ref[0] = root
        sp0, pid0, n_pops = next_portal(jnp.int32(1), best[0], n_pops)

        @pl.when(pid0 >= 0)
        def _():
            for cp in _page_copies(pid0, jnp.int32(0)):
                cp.start()

        def outer_body(c):
            sp, pid_cur, slot, state, np_, nt_ = c
            # locate the NEXT portal while pid_cur's DMAs are in flight
            sp, pid_next, np_ = next_portal(sp, state[0], np_)
            for cp in _page_copies(pid_cur, slot):
                cp.wait()

            @pl.when(pid_next >= 0)
            def _():
                for cp in _page_copies(pid_next, 1 - slot):
                    cp.start()

            state, np_, nt_ = traverse_page(
                pid_cur, slot, (state, np_, nt_)
            )
            return sp, pid_next, 1 - slot, state, np_, nt_

        carry = (sp0, pid0, jnp.int32(0), best, n_pops, n_tests)
        carry = jax.lax.while_loop(lambda c: c[1] >= 0, outer_body, carry)
        _, _, _, best, n_pops, n_tests = carry

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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedTables:
    """Device-side inputs of the paged kernel (a jit-traversable pytree;
    pass through the jit boundary alongside the SceneArrays — the page
    partition is value-dependent host work, so it cannot be derived
    inside a traced function)."""

    top_root: jax.Array  # [M] i32 top-tree rank per mesh root
    page_tab: jax.Array  # [P, 2] i32 (node0, tri0)
    top_code: jax.Array  # [ceil(Nt/128), 128] i32
    top_nodef: jax.Array  # [ceil(Nt/8), 128] f32
    gcode: jax.Array  # [*, 128] i32 global control words (HBM-resident)
    gnodef: jax.Array  # [*, 128] f32 global node records
    gtrif: jax.Array  # [*, 128] f32 global triangle records
    # Optional per-page 4-WIDE collapse (kernels/paged_wide.py): each
    # page's subtree re-collapsed into a page-LOCAL wide layout stored
    # at a fixed row stride, so one page = one fixed-size DMA window.
    # None when the wide build is disabled (TRT_PAGED_WIDE=0).
    pwcode: jax.Array | None = None  # [P*wcode_rows, 128] i32
    pwnodef: jax.Array | None = None  # [P*wnode_rows, 128] f32
    # static row strides per page (compile-time buffer capacities)
    wcode_rows: int = dataclasses.field(default=0, metadata=dict(static=True))
    wnode_rows: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_pages(self) -> int:
        return self.page_tab.shape[0]

    @property
    def has_wide(self) -> bool:
        return self.pwcode is not None


def _pad_rows(a: jax.Array, rows: int, fill) -> jax.Array:
    """Append ``rows`` fill rows so fixed-size page DMAs starting at the
    last valid base row stay in bounds."""
    return jnp.concatenate(
        [a, jnp.full((rows, a.shape[1]), fill, a.dtype)], axis=0
    )


# Small LRU (insertion-ordered dict): each entry pins the scene's
# node_child_a plus full HBM copies of the packed tables, so an
# unbounded cache would leak device memory across many distinct scenes.
_PAGE_CACHE: dict = {}
_PAGE_CACHE_MAX = 4


def _paged_wide_default() -> bool:
    import os

    return os.environ.get("TRT_PAGED_WIDE", "1") == "1"


def _build_page_wide(pt: PageTable, child_a, child_b, leaf_start,
                     leaf_count, node_min, node_max):
    """Collapse every page's binary subtree into a page-LOCAL 4-wide
    layout (accel/wide.py collapse4 semantics) packed at a fixed row
    stride, so the paged-wide kernel (kernels/paged_wide.py) can DMA
    one fixed-size window per page. Node ids inside a page's wcode are
    page-local wide ids (root = 0); leaf codes carry PAGE-LOCAL
    triangle starts (+ page_tri0 at decode, same rebasing as the
    binary paged path). Returns (pwcode, pwnodef, wcode_rows,
    wnode_rows) as numpy."""
    from ..accel.paging import _subtree_extents
    from ..accel.wide import collapse4
    from .wide4 import REC32, REC32_PER_ROW

    size, _, _ = _subtree_extents(child_a, child_b, leaf_start, leaf_count)
    is_leaf = child_a < 0
    pages = []
    w_max = 1
    for p in range(pt.num_pages):
        n0 = int(pt.page_node0[p])
        t0 = int(pt.page_tri0[p])
        sl = slice(n0, n0 + int(size[n0]))
        ca = child_a[sl]
        cb = child_b[sl]
        lf = is_leaf[sl]
        w = collapse4(
            np.where(lf, ca, ca - n0),
            np.where(lf, cb, cb - n0),
            np.where(lf, leaf_start[sl] - t0, 0),
            leaf_count[sl],
            node_min[sl],
            node_max[sl],
            np.zeros(1, np.int64),
        )
        pages.append(w)
        w_max = max(w_max, w.num_nodes)
    wnode_rows = _round8(-(-w_max // REC32_PER_ROW))
    wcode_rows = _round8(-(-(4 * w_max) // TILE_L))
    n_pages = pt.num_pages
    pwcode = np.full((n_pages * wcode_rows, TILE_L), -1, np.int32)
    pwnodef = np.zeros((n_pages * wnode_rows, TILE_L), np.float32)
    for p, w in enumerate(pages):
        n = w.num_nodes
        rec = np.zeros((n, REC32), np.float32)
        for c in range(4):
            mn = w.wbox_min[:, c] - np.float32(NUDGE)
            mx = w.wbox_max[:, c] + np.float32(NUDGE)
            for j in range(3):
                rec[:, 6 * c + j] = mn[:, j]
                rec[:, 6 * c + 3 + j] = mx[:, j]
        pad_n = (-n) % REC32_PER_ROW
        if pad_n:
            rec = np.concatenate([rec, np.zeros((pad_n, REC32), np.float32)])
        rows = rec.reshape(-1, TILE_L)
        pwnodef[p * wnode_rows : p * wnode_rows + rows.shape[0]] = rows
        codes = w.wcode
        pad_c = (-len(codes)) % TILE_L
        if pad_c:
            codes = np.concatenate([codes, np.full(pad_c, -1, np.int32)])
        crows = codes.reshape(-1, TILE_L)
        pwcode[p * wcode_rows : p * wcode_rows + crows.shape[0]] = crows
    return pwcode, pwnodef, wcode_rows, wnode_rows


def prepare_paged(scene: SceneArrays, page_tris: int = PAGE_TRIS,
                  page_nodes: int = PAGE_NODES,
                  wide: bool | None = None) -> PagedTables:
    """Build (and cache) the page partition + packed tables for a
    compiled scene. EAGER host work — call outside jit; the result is a
    pytree to pass into the jitted paged render path.

    ``page_tris``/``page_nodes`` may be lowered (never raised — the
    kernel's buffer capacities are compile-time constants sized for the
    defaults) to force many small pages, e.g. in tests. ``wide``
    additionally builds the per-page 4-wide tables for the paged-wide
    kernel (default: the TRT_PAGED_WIDE routing default)."""
    if page_tris > PAGE_TRIS or page_nodes > PAGE_NODES:
        raise ValueError("page cut sizes cannot exceed the buffer capacity")
    if wide is None:
        wide = _paged_wide_default()
    if (scene.paged is not None and page_tris == PAGE_TRIS
            and page_nodes == PAGE_NODES
            and (scene.paged.has_wide or not wide)):
        return scene.paged  # already attached (Scene.compile auto-page)
    key = (id(scene.node_child_a), page_tris, page_nodes, wide)
    hit = _PAGE_CACHE.get(key)
    if hit is not None and hit[0] is scene.node_child_a:
        _PAGE_CACHE[key] = _PAGE_CACHE.pop(key)  # refresh LRU order
        return hit[1]

    if scene.num_triangles >= 2 ** 28:
        raise ValueError(
            "paged traversal caps at 2^28 triangles (i32 ids)"
        )
    pt = build_page_table(
        np.asarray(scene.node_min),
        np.asarray(scene.node_max),
        np.asarray(scene.node_child_a),
        np.asarray(scene.node_child_b),
        np.asarray(scene.node_leaf_start),
        np.asarray(scene.node_leaf_count),
        np.asarray(scene.mesh_root),
        page_tris=page_tris,
        page_nodes=page_nodes,
    )

    # jitted: building 1M+ packed triangle records eagerly dispatches
    # hundreds of CPU ops (~35s at 1.28M tris); one compiled program
    # takes ~1s
    (_, _), (code_arr, nodef), (trif,) = jax.jit(_scene_kernel_inputs)(scene)

    # Rebase leaf control words to PAGE-LOCAL triangle starts: local
    # offsets fit the packed word at any scene size, unlike global
    # starts (the old 2^21-triangle cap). Each node's owning page is
    # the last page starting at or before it — valid for every in-page
    # node by subtree contiguity; above-cut nodes get garbage values
    # but are only ever traversed via the top tree.
    code_flat = np.asarray(code_arr).ravel().copy()
    n_nodes = scene.node_child_a.shape[0]
    codes = code_flat[:n_nodes]
    leaf_ids = np.nonzero(codes < 0)[0]
    packed = -codes[leaf_ids].astype(np.int64) - 1
    g_start = packed >> LEAF_BITS
    count = packed & MAX_LEAF_TRIS
    pidx = np.searchsorted(pt.page_node0, leaf_ids, side="right") - 1
    if (pidx < 0).any():
        raise AssertionError("leaf node precedes the first page")
    local = g_start - pt.page_tri0[pidx]
    if (local < 0).any() or (local >= page_tris + LEAF_UNROLL).any():
        raise AssertionError("page-local leaf start out of range")
    code_flat[leaf_ids] = (-(local * LEAF_SHIFT + count) - 1).astype(
        np.int32
    )
    code_arr = jnp.asarray(code_flat.reshape(np.asarray(code_arr).shape))

    fields = []
    for c in range(2):
        # watertight NUDGE baked, matching _scene_kernel_inputs
        mn = pt.top_child_min[:, c] - NUDGE
        mx = pt.top_child_max[:, c] + NUDGE
        fields += [mn[:, 0], mn[:, 1], mn[:, 2], mx[:, 0], mx[:, 1], mx[:, 2]]
    top_nodef = _pack_records(
        [jnp.asarray(f) for f in fields], pt.num_top_nodes
    )

    wide_kw: dict = {}
    if wide:
        pwcode, pwnodef, wcode_rows, wnode_rows = _build_page_wide(
            pt,
            np.asarray(scene.node_child_a),
            np.asarray(scene.node_child_b),
            np.asarray(scene.node_leaf_start),
            np.asarray(scene.node_leaf_count),
            np.asarray(scene.node_min),
            np.asarray(scene.node_max),
        )
        wide_kw = dict(
            pwcode=jnp.asarray(pwcode),
            pwnodef=jnp.asarray(pwnodef),
            wcode_rows=wcode_rows,
            wnode_rows=wnode_rows,
        )

    tables = PagedTables(
        top_root=jnp.asarray(pt.top_root),
        page_tab=jnp.asarray(
            np.stack([pt.page_node0, pt.page_tri0], axis=1).astype(np.int32)
        ),
        top_code=_pack128(jnp.asarray(pt.top_code), -1),
        top_nodef=top_nodef,
        gcode=_pad_rows(code_arr, CODE_ROWS, -1),
        gnodef=_pad_rows(nodef, NODE_ROWS, 0.0),
        gtrif=_pad_rows(trif, TRI_ROWS, 0.0),
        **wide_kw,
    )
    while len(_PAGE_CACHE) >= _PAGE_CACHE_MAX:
        _PAGE_CACHE.pop(next(iter(_PAGE_CACHE)))
    _PAGE_CACHE[key] = (scene.node_child_a, tables)
    return tables


def _run_paged(scene: SceneArrays, tables: PagedTables, tiled, interpret,
               worigin=None):
    uniform_o = worigin is not None
    if uniform_o:
        dx, dy, dz = tiled
    else:
        ox, oy, oz, dx, dy, dz = tiled
    n_tiles = dx.shape[0]
    quat = T.euler2quat(scene.inst_pose[:, 3:6])
    pad = jnp.zeros((scene.num_instances, 2), jnp.float32)
    inst_tab = jnp.concatenate(
        [quat, scene.inst_pose[:, 0:3], scene.inst_inv_scale, pad], axis=1
    )
    inst_root = tables.top_root[scene.inst_mesh]
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
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    if uniform_o:
        wo = jnp.asarray(worigin, jnp.float32)
        inputs = (
            inst_tab, inst_root, tables.page_tab, wo,
            dx, dy, dz,
            tables.top_code, tables.top_nodef,
            tables.gcode, tables.gnodef, tables.gtrif,
        )
        in_specs = (
            [smem_whole(inst_tab), smem_whole(inst_root),
             smem_whole(tables.page_tab), smem_whole(wo)]
            + [ray_spec] * 3
            + [vmem_whole(tables.top_code), vmem_whole(tables.top_nodef)]
            + [any_spec] * 3
        )
    else:
        inputs = (
            inst_tab, inst_root, tables.page_tab,
            ox, oy, oz, dx, dy, dz,
            tables.top_code, tables.top_nodef,
            tables.gcode, tables.gnodef, tables.gtrif,
        )
        in_specs = (
            [smem_whole(inst_tab), smem_whole(inst_root),
             smem_whole(tables.page_tab)]
            + [ray_spec] * 6
            + [vmem_whole(tables.top_code), vmem_whole(tables.top_nodef)]
            + [any_spec] * 3
        )
    f32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32)
    i32s = jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32)
    out_shape = (f32s, i32s, i32s) + ((i32s, i32s) if with_stats else ())
    kernel = functools.partial(
        _paged_kernel, scene.num_instances, with_stats, uniform_o
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(ray_spec,) * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((_SMEM_SLOTS,), jnp.int32),
            # double-buffered page slices: halves [0, R) and [R, 2R)
            pltpu.VMEM((2 * CODE_ROWS, TILE_L), jnp.int32),
            pltpu.VMEM((2 * NODE_ROWS, TILE_L), jnp.float32),
            pltpu.VMEM((2 * TRI_ROWS, TILE_L), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if with_stats:
        t, tri, inst, pops, tests = outs
        _PAGED_STATS["pops"] = pops[:, 0, 0]
        _PAGED_STATS["tests"] = tests[:, 0, 0]
    else:
        t, tri, inst = outs
    return t, tri, inst


_PAGED_STATS: dict = {}


def cast_rays_paged(scene: SceneArrays, tables: PagedTables, origin,
                    directions, interpret=None):
    """Nearest-hit query with the HBM-paged packet kernel. Same Hit
    record and ray-layout handling as cast_rays_pallas. Routing:
    PAGE-MAJOR kernel (kernels/paged_major.py — each page DMA'd once
    per instance per frame) when TRT_PAGED_MAJOR=1; else the tile-major
    paged-WIDE kernel when the tables carry the per-page 4-wide
    collapse (default; TRT_PAGED_WIDE=0 forces the binary in-page
    loop)."""
    from ..render.renderer import Hit  # local: avoids cycle

    if (tables.has_wide
            and os.environ.get("TRT_PAGED_MAJOR", "0") == "1"):
        from .paged_major import cast_rays_paged_major

        return cast_rays_paged_major(
            scene, tables, origin, directions, interpret=interpret
        )

    if tables.has_wide and _paged_wide_default():
        from .paged_wide import cast_rays_paged_wide

        return cast_rays_paged_wide(
            scene, tables, origin, directions, interpret=interpret
        )

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
        t, tri, inst = _run_paged(scene, tables, tiled, interpret, worigin)
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
    t, tri, inst = _run_paged(scene, tables, tiled, interpret, worigin)
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return Hit(t=unpack(t), tri=unpack(tri), inst=unpack(inst))
