"""HBM-paged traversal with a 4-WIDE in-page loop.

The binary paged kernel (kernels/paged.py) is in-page-pop bound: its
per-page subtree walk pays one ~600-cycle vector->SMEM->scalar sync per
POP_K=2 binary pops, and PERF_LOG r3 shows the resident kernel gained
145 -> 170 Mrays/s from replacing binary pops with 4-wide pops
(kernels/wide4.py). This kernel applies the same collapse to the paged
path: prepare_paged additionally re-collapses EVERY page's binary
subtree into a page-LOCAL 4-wide layout stored at a fixed row stride
(paged.py:_build_page_wide), so a page is one fixed-size window of the
wide tables and the in-page loop pops 4-wide nodes.

Differences from the resident wide kernel (kernels/wide4.py):
  * wide child codes cannot live in SMEM (they are per-page, DMA'd from
    HBM, and Mosaic DMAs target VMEM): the vector phase extracts the
    popped node's FOUR child codes from its (single) VMEM code row with
    lane-masked reduces and parks them in SMEM next to the sync word,
    so the scalar phase still reads codes scalar-direct;
  * wide node ids are PAGE-LOCAL (root = 0) — in-page fetches add the
    buffer half's base row instead of subtracting a global base;
  * leaf codes carry PAGE-LOCAL triangle starts, rebased +page_tri0 at
    decode exactly like the binary paged kernel (global tri ids in the
    hit record; no global-start size cap).

Top-tree walk, portal selection, and the double-buffered page DMA
pipeline are identical to kernels/paged.py — only the three per-page
copies now move (pwcode window, pwnodef window, triangle rows), and the
in-page loop is the wide popk. Traversal semantics (ordered near-first
descent, live per-ray t caps, exact triangle math) are unchanged, so
hits still match the brute-force oracle. Reference capability:
everything-resident traversal at any scene size, Scene.cpp:41-64 +
the hot loop raycast.cu:54-138.
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
    LEAF_BITS,
    LEAF_UNROLL,
    MAX_LEAF_TRIS,
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
    _quat_rot,
    _stats_enabled,
    _tiles_to_image,
    make_test_tri,
    T,
)
from .paged import TRI_ROWS, PagedTables, _PAGED_STATS
from .wide4 import REC32, REC32_PER_ROW, STACK_W

# Wide pops per scalar sync in-page (the resident wide kernel's POP_KW;
# measured best = 2 there, same default here).
POP_KW = int(os.environ.get("TRT_PAGED_WIDE_POPK", "2"))

# Triangles per leaf-loop iteration. The r3 stats breakdown showed leaf
# ROW iterations dominate the paged kernel's serial steps (92 of ~175
# per tile on the 1.28M colonnade); 16 issues two independent row loads
# per iteration — one iteration covers a whole min_leaf=16 leaf, same
# as the resident kernel's LEAF_U=16 default (+7% there).
LEAF_UP = int(os.environ.get("TRT_PAGED_LEAF_U", "16"))
assert LEAF_UP % LEAF_UNROLL == 0

# nodes per 128-lane code row (4 child words per wide node)
_NODES_PER_CROW = TILE_L // 4


def make_inpage_traverser(smem_ref, wcbuf_ref, wnbuf_ref, tribuf_ref,
                          lane1, lane16, sub16, lane32, sub32,
                          slab, test_tri,
                          stack_base, wcode_slot, wpush_slot):
    """Build the 4-WIDE in-page traversal closure shared by the paged
    kernels (tile-major paged_wide and page-major paged_major).

    Returns ``traverse(tri0, crow0, nrow0, trow_page, srow, state) ->
    (state', pops, tests)`` where ``state`` is the (t, tri, inst)
    best-hit triple, ``tri0``/``trow_page`` rebase page-local leaf
    starts to global ids, and ``crow0``/``nrow0``/``srow`` are the
    buffer half's base rows. SMEM layout is parameterized:
    ``stack_base`` (STACK_W slots), ``wcode_slot`` (4*POP_KW child
    codes), ``wpush_slot`` (POP_KW sync words).

    Per sync the vector phase computes each pop's 4 child entries,
    packs the sync word (hit count + near-first permutation,
    kernels/wide4.py) AND parks the 4 child codes in SMEM via
    lane-masked reduces of the node's single code row (per-page codes
    are DMA'd, so the scalar core cannot read them directly); the
    scalar phase then runs entirely SMEM-direct. Leaf loops issue
    LEAF_UP/8 independent row loads per fori step (overshoot rows
    clamped in the page window, tests masked by count)."""

    def fetch32(k_, nrow0):
        row = wnbuf_ref[pl.ds(k_ // REC32_PER_ROW + nrow0, 1), :]
        rep = jnp.broadcast_to(row, (REC32, TILE_L))
        mask = lane32 == (k_ % REC32_PER_ROW) * REC32 + sub32
        vals = jnp.sum(jnp.where(mask, rep, 0.0), axis=1, keepdims=True)
        return vals + jnp.zeros((REC32, TILE_L), jnp.float32)

    def leaf_loop(start, count, st, trow_page, srow):
        def row_tests(kr, count_end, acc):
            t_b, tri_b, in_b = acc
            row_i = jnp.minimum(
                kr // REC_PER_ROW - trow_page, TRI_ROWS - 1
            ) + srow
            row = tribuf_ref[pl.ds(row_i, 1), :]
            rep = jnp.broadcast_to(row, (REC_LANES, TILE_L))
            for u_ in range(LEAF_UNROLL):
                k = kr + u_
                mask = lane16 == u_ * REC_LANES + sub16  # static
                vals = jnp.sum(
                    jnp.where(mask, rep, 0.0), axis=1, keepdims=True
                )
                rec = vals + jnp.zeros((REC_LANES, TILE_L), jnp.float32)
                t_b, tri_b, in_b = test_tri(
                    rec, k, k < count_end, t_b, tri_b, in_b
                )
            return t_b, tri_b, in_b

        n_rows = LEAF_UP // LEAF_UNROLL

        def quad_body(q, acc):
            k0 = start + q * LEAF_UP
            for r_ in range(n_rows):
                acc = row_tests(k0 + r_ * REC_PER_ROW, start + count, acc)
            return acc

        n_quads = (count + LEAF_UP - 1) // LEAF_UP
        return jax.lax.fori_loop(0, n_quads, quad_body, st)

    def traverse(tri0, crow0, nrow0, trow_page, srow, state0):
        smem_ref[stack_base] = 0  # page-local wide root

        def page_body(c):
            spp, state, np_, nt_ = c
            t_b = state[0]
            nodes, acts = [], []
            spm = spp
            for j in range(POP_KW):
                acts.append((spp > j).astype(jnp.int32))
                nodes.append(
                    smem_ref[stack_base + jnp.maximum(spp - 1 - j, 0)]
                )
                spm = spm - acts[j]

            # --- vector phase: issue everything, read nothing ---
            for j in range(POP_KW):
                node = nodes[j]
                crow = wcbuf_ref[
                    pl.ds(node // _NODES_PER_CROW + crow0, 1), :
                ]
                lbase = (node % _NODES_PER_CROW) * 4
                for c_ in range(4):
                    smem_ref[wcode_slot + 4 * j + c_] = jnp.sum(
                        jnp.where(lane1 == lbase + c_, crow, 0)
                    )
                rec = fetch32(node, nrow0)
                ds = [slab(rec, 6 * c_, t_b) for c_ in range(4)]
                hs = [(d < BIG).astype(jnp.int32) for d in ds]
                count = hs[0] + hs[1] + hs[2] + hs[3]
                word = count
                for c_ in range(4):
                    r = jnp.int32(0)
                    for k in range(4):
                        if k == c_:
                            continue
                        r = r + (
                            (ds[k] < ds[c_])
                            | ((ds[k] == ds[c_]) & (k < c_))
                        ).astype(jnp.int32)
                    word = word + jnp.left_shift(jnp.int32(c_), 3 + 2 * r)
                smem_ref[wpush_slot + j] = word

            # --- scalar phase (one combined stall) ---
            sp_out = spm
            leaf = []
            for j in reversed(range(POP_KW)):
                act = acts[j]
                w_ = smem_ref[wpush_slot + j]
                count = (w_ & 7) * act
                pop_leaves = []
                for p in reversed(range(4)):  # farthest -> nearest
                    csel = (w_ >> (3 + 2 * p)) & 3
                    active = (count > p).astype(jnp.int32)
                    code = smem_ref[wcode_slot + 4 * j + csel]
                    is_int = ((code >= 0).astype(jnp.int32)) * active
                    # scratch writes above the stack top must stay
                    # valid node ids (clamp; see CLAUDE.md r3 note)
                    smem_ref[stack_base + sp_out] = jnp.maximum(code, 0)
                    sp_out = sp_out + is_int
                    packed = -code - 1
                    lcount = (packed & MAX_LEAF_TRIS) * (active - is_int)
                    pop_leaves.append(
                        ((packed >> LEAF_BITS) + tri0, lcount)
                    )
                leaf.extend(pop_leaves[::-1])  # nearest-first
            pops = acts[0]
            for a in acts[1:]:
                pops = pops + a

            nt = nt_
            for s_, c_ in leaf:
                state = leaf_loop(s_, c_, state, trow_page, srow)
                nt = nt + c_
            return sp_out, state, np_ + pops, nt

        c = (jnp.int32(1), state0, jnp.int32(0), jnp.int32(0))
        c = jax.lax.while_loop(lambda c: c[0] > 0, page_body, c)
        return c[1], c[2], c[3]

    return traverse

# SMEM layout: top stack | page wide stack | top code+push | per-pop
# child codes (4 each) | per-pop sync words
_PSTACK = STACK_SIZE
_S_TCODE = STACK_SIZE + STACK_W
_S_TPUSH = _S_TCODE + 1
_S_WCODE = _S_TPUSH + 1
_S_WPUSH = _S_WCODE + 4 * POP_KW
_SMEM_SLOTS = _S_WPUSH + POP_KW


def _paged_wide_kernel(num_instances, with_stats, uniform_o, wcode_rows,
                       wnode_rows, *refs):
    if uniform_o:
        (
            inst_tab_ref,  # SMEM [I, 12] f32 quat/pos/inv_scale
            inst_root_ref,  # SMEM [I] i32 TOP-TREE rank of the instance root
            page_tab_ref,  # SMEM [P, 2] i32 (node0, tri0) per page
            worigin_ref,  # SMEM [3] f32 world-space ray origin
            dx_ref, dy_ref, dz_ref,  # VMEM [1, TILE_S, 128] f32 ray tiles
            tcode_ref,  # VMEM [ceil(Nt/128), 128] i32 top control words
            tnodef_ref,  # VMEM [ceil(Nt/8), 128] f32 top 16-lane records
            pwcode_ref,  # ANY [P*wcode_rows, 128] i32 per-page wide codes
            pwnodef_ref,  # ANY [P*wnode_rows, 128] f32 per-page wide records
            gtrif_ref,  # ANY [*, 128] f32 global triangle records (HBM)
        ) = refs[:12]
        rest = refs[12:]
        ox_ref = oy_ref = oz_ref = None
    else:
        (
            inst_tab_ref,
            inst_root_ref,
            page_tab_ref,
            ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref,
            tcode_ref,
            tnodef_ref,
            pwcode_ref,
            pwnodef_ref,
            gtrif_ref,
        ) = refs[:14]
        rest = refs[14:]
    if with_stats:
        (t_out_ref, tri_out_ref, inst_out_ref, pops_ref, tests_ref,
         pages_ref, smem_ref, wcbuf_ref, wnbuf_ref, tribuf_ref,
         sem_ref) = rest
    else:
        (t_out_ref, tri_out_ref, inst_out_ref,
         smem_ref, wcbuf_ref, wnbuf_ref, tribuf_ref, sem_ref) = rest

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 0)
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 1)
    sub32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 0)

    def fetch16(ref, k, row0):
        """One 16-field record as [16, 128] broadcast rows (top tree)."""
        row = ref[pl.ds(k // REC_PER_ROW - row0, 1), :]
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
    # stats word: page visits (low 16 bits) + top-tree pops (high bits)
    n_pages = jnp.int32(0)

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

        def slab(rec, base, t_cap):
            """Packet slab test on rows base..base+5 of a record."""
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

        # identical math to every other kernel (traversal.make_test_tri)
        test_tri = make_test_tri(
            (oox, ooy, ooz), (odx, ody, odz),
            None if num_instances == 1 else i,
        )

        traverse_inpage = make_inpage_traverser(
            smem_ref, wcbuf_ref, wnbuf_ref, tribuf_ref,
            lane1, lane16, sub16, lane32, sub32,
            slab, test_tri, _PSTACK, _S_WCODE, _S_WPUSH,
        )

        def pop1_top(sp, t_b):
            """Single-pop top-tree step (tiny tree; kernels/paged.py)."""
            node = smem_ref[sp - 1]
            crow = tcode_ref[pl.ds(node // TILE_L, 1), :]
            smem_ref[_S_TCODE] = jnp.sum(
                jnp.where(lane1 == node % TILE_L, crow, 0)
            )
            rec = fetch16(tnodef_ref, node, 0)
            da = slab(rec, 0, t_b)
            db = slab(rec, 6, t_b)
            smem_ref[_S_TPUSH] = (
                (da <= db).astype(jnp.int32)
                + 2 * (da < BIG).astype(jnp.int32)
                + 4 * (db < BIG).astype(jnp.int32)
            )
            code = smem_ref[_S_TCODE]
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

        def next_portal(sp, t_b, npg):
            """Walk the top tree until the next portal leaf pops or the
            stack empties. Returns (sp', page id or -1, stats word with
            top pops accumulated into the HIGH half)."""

            def cond(c):
                return (c[0] > 0) & (c[1] < 0)

            def body(c):
                sp, _, npg = c
                sp, code = pop1_top(sp, t_b)
                pid = jnp.where(code < 0, -code - 1, jnp.int32(-1))
                return sp, pid, npg + (1 << 16)

            return jax.lax.while_loop(cond, body, (sp, jnp.int32(-1), npg))

        def _page_copies(pid, slot):
            """Three HBM->VMEM copies for page ``pid`` into buffer half
            ``slot``: the page's wide-code window, wide-record window,
            and triangle rows. Fixed shapes, row counts multiples of 8
            (the v5e DMA alignment constraint, kernels/paged.py)."""
            tri0 = page_tab_ref[pid, 1]
            trow0 = tri0 // REC_PER_ROW
            return (
                pltpu.make_async_copy(
                    pwcode_ref.at[pl.ds(pid * wcode_rows, wcode_rows), :],
                    wcbuf_ref.at[pl.ds(slot * wcode_rows, wcode_rows), :],
                    sem_ref.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    pwnodef_ref.at[pl.ds(pid * wnode_rows, wnode_rows), :],
                    wnbuf_ref.at[pl.ds(slot * wnode_rows, wnode_rows), :],
                    sem_ref.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    gtrif_ref.at[pl.ds(trow0, TRI_ROWS), :],
                    tribuf_ref.at[pl.ds(slot * TRI_ROWS, TRI_ROWS), :],
                    sem_ref.at[slot, 2],
                ),
            )

        def traverse_page(pid, slot, carry):
            """Traverse page ``pid``'s 4-wide subtree from buffer half
            ``slot`` (DMAs already waited; make_inpage_traverser).
            Wide ids are page-local (root 0); leaf starts rebased
            +tri0 at decode."""
            tri0 = page_tab_ref[pid, 1]
            crow0 = slot * wcode_rows  # buffer base rows (ADD: local ids)
            nrow0 = slot * wnode_rows
            trow_page = tri0 // REC_PER_ROW
            srow = slot * TRI_ROWS
            state, np_, nt_ = carry
            state, pops, tests = traverse_inpage(
                tri0, crow0, nrow0, trow_page, srow, state
            )
            return state, np_ + pops, nt_ + tests

        # --- double-buffered page pipeline (kernels/paged.py) ----------
        root = inst_root_ref[i]
        smem_ref[0] = root
        sp0, pid0, n_pages = next_portal(jnp.int32(1), best[0], n_pages)

        @pl.when(pid0 >= 0)
        def _():
            for cp in _page_copies(pid0, jnp.int32(0)):
                cp.start()

        def outer_body(c):
            sp, pid_cur, slot, state, np_, nt_, npg = c
            sp, pid_next, npg = next_portal(sp, state[0], npg)
            for cp in _page_copies(pid_cur, slot):
                cp.wait()

            @pl.when(pid_next >= 0)
            def _():
                for cp in _page_copies(pid_next, 1 - slot):
                    cp.start()

            state, np_, nt_ = traverse_page(pid_cur, slot, (state, np_, nt_))
            return sp, pid_next, 1 - slot, state, np_, nt_, npg + 1

        carry = (sp0, pid0, jnp.int32(0), best, n_pops, n_tests, n_pages)
        carry = jax.lax.while_loop(lambda c: c[1] >= 0, outer_body, carry)
        _, _, _, best, n_pops, n_tests, n_pages = carry

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
        pages_ref[0] = zeros + n_pages


def _run_paged_wide(scene: SceneArrays, tables: PagedTables, tiled,
                    interpret, worigin=None):
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
            tables.pwcode, tables.pwnodef, tables.gtrif,
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
            tables.pwcode, tables.pwnodef, tables.gtrif,
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
    out_shape = (f32s, i32s, i32s) + (
        (i32s, i32s, i32s) if with_stats else ()
    )
    kernel = functools.partial(
        _paged_wide_kernel, scene.num_instances, with_stats, uniform_o,
        tables.wcode_rows, tables.wnode_rows,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(ray_spec,) * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((_SMEM_SLOTS,), jnp.int32),
            # double-buffered page windows: halves [0, R) and [R, 2R)
            pltpu.VMEM((2 * tables.wcode_rows, TILE_L), jnp.int32),
            pltpu.VMEM((2 * tables.wnode_rows, TILE_L), jnp.float32),
            pltpu.VMEM((2 * TRI_ROWS, TILE_L), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if with_stats:
        t, tri, inst, pops, tests, pages = outs
        _PAGED_STATS["pops"] = pops[:, 0, 0]
        _PAGED_STATS["tests"] = tests[:, 0, 0]
        _PAGED_STATS["pages"] = pages[:, 0, 0] & 0xFFFF
        _PAGED_STATS["top_pops"] = pages[:, 0, 0] >> 16
    else:
        t, tri, inst = outs
    return t, tri, inst


def cast_rays_paged_wide(scene: SceneArrays, tables: PagedTables, origin,
                         directions, interpret=None):
    """Nearest-hit query with the wide-pop HBM-paged kernel. Requires
    tables built with wide=True (prepare_paged). Same Hit record and
    ray-layout handling as cast_rays_paged."""
    from ..render.renderer import Hit  # local: avoids cycle

    if not tables.has_wide:
        raise ValueError("tables lack the per-page wide collapse")
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
        t, tri, inst = _run_paged_wide(
            scene, tables, tiled, interpret, worigin
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
    t, tri, inst = _run_paged_wide(scene, tables, tiled, interpret, worigin)
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return Hit(t=unpack(t), tri=unpack(tri), inst=unpack(inst))
