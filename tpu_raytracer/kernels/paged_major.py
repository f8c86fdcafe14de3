"""PAGE-MAJOR paged traversal: the scene streams once per frame.

The tile-major paged kernels (kernels/paged.py / paged_wide.py) walk a
top tree per ray tile and DMA every page the tile's packet can reach.
Page visits per tile shrink as tiles get smaller, so TOTAL page DMA
traffic is roughly scene-coverage-bound — a per-FRAME fixed cost the r3
page-size sweep measured at ~8.5 ms on the 1.28M-tri colonnade
(PERF_LOG r3: ms/frame = 8.5 + rays / 153e6 at both 512^2 and 1024^2).
Each page is re-fetched by every tile that sees it.

This kernel inverts the loop — the classic weight-stationary ->
output-stationary swap, applied to geometry:

  * ALL tiles' ray state (t/tri/inst, plus the ray components) is
    resident in VMEM for the whole frame (a 512^2 frame is ~6 MB of
    state; pages would be ~120 MB);
  * the grid runs over PAGES, front-to-back: each page's three windows
    (wide codes, wide records, triangle rows) are DMA'd HBM->VMEM
    exactly ONCE, double-buffered across grid steps;
  * a host-computed conservative (page, tile) visibility bitmask — the
    packet-interval slab test of the page's AABB, same interval
    arithmetic as the resident kernel's frustum mode
    (traversal.py:_frustum_table) — drives a per-tile skip, and pages
    no tile can see skip their DMA entirely;
  * per (page, wanting-tile): the standard 4-wide in-page packet
    traversal (kernels/paged_wide.py), with the tile's live per-ray
    t caps read straight from the resident state, so front-to-back
    page order keeps t-pruning effective.

Page DMA cost drops from O(page visits) to O(pages). The in-page
vector work is unchanged.

Instanced scenes sweep (instance, page) work ITEMS: the grid enumerates
all I x P pairs, pages outside an instance's mesh (or invisible to
every tile in that instance's object space) are masked unwanted and
skip their DMA + tile loop entirely, and each item's in-page traversal
runs in its instance's object space with the instance id recorded on
accepts (a third resident i32 state block, multi-instance only) —
page DMA count O(instances x visible pages), vs the tile-major
kernels' O(page visits) (VERDICT r3 weak #4). Hit results still match
the brute-force oracle exactly: the bitmask is a conservative superset
of the pages any per-ray walk would enter, the in-page math is
make_test_tri, and leaf acceptance is strict t < t_best — so visiting
pages in a different order changes visit counts, never results (see
the exactness NOTE below for the one cross-page exact-t-tie caveat).

Reference capability: everything-resident traversal at any scene size
(Scene.cpp:41-64) — here the scene is HBM-resident and VMEM sees each
byte once per frame.

NOTE on exactness vs page order: two triangles in DIFFERENT pages can
tie on t. The tile-major kernels break ties by traversal order (first
tested wins, strict t < t_best); changing page order could flip such
ties. The leaf codes' triangle ids are GLOBAL, and all paged kernels
(and the oracle) accept strictly-better t only, keeping the FIRST
tested triangle on exact ties — so a cross-page exact-t tie is the one
case where page order shows. The oracle tests (test_paged_major.py)
run scenes with unique nearest hits; the standing EDGE_EPS tie policy
(intersect.py) already moves systematic ties off the knife edge.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import transforms as T
from ..scene.scene import SceneArrays
from .traversal import (
    BIG,
    PIX_H,
    PIX_W,
    REC_LANES,
    REC_PER_ROW,
    TILE,
    TILE_L,
    TILE_S,
    _FLT_MAX,
    _FRUSTUM_ABS,
    _FRUSTUM_REL,
    _image_to_tiles,
    _quat_rot,
    _stats_enabled,
    _tiles_to_image,
    make_test_tri,
)
from .paged import TRI_ROWS, PagedTables, _PAGED_STATS
from .paged_wide import POP_KW, make_inpage_traverser
from .wide4 import REC32, STACK_W

# VMEM budget for the resident ray state: (3 outs + 3 dirs [+3 origins]
# [+1 stats]) row-blocks of TILE_S x 128 f32 per tile (16 KB each) must
# fit beside the double-buffered page windows. Frames beyond the cap
# chunk into multiple pallas_calls (pages re-stream per chunk — still
# O(pages * chunks), far below O(page visits)). A 1080p uniform-origin
# frame (507 tiles x 96 KB = 49 MB) fits one sweep.
# TRT_PAGED_MAJOR_TILES overrides the computed cap.
_STATE_BUDGET = 80 * 1024 * 1024
MAX_MAJOR_TILES = int(os.environ.get("TRT_PAGED_MAJOR_TILES", "0"))


def _tile_cap(tables: PagedTables, uniform_o: bool, with_stats: bool,
              multi: bool = False) -> int:
    if MAX_MAJOR_TILES > 0:
        return MAX_MAJOR_TILES
    per_tile = (
        (5 if uniform_o else 8) + (1 if with_stats else 0)
        + (1 if multi else 0)
    )
    per_tile *= TILE_S * TILE_L * 4
    buffers = 4 * 2 * (
        tables.wcode_rows + tables.wnode_rows + TRI_ROWS
    ) * TILE_L
    return max(8, (_STATE_BUDGET - buffers) // per_tile)

# SMEM scratch: page-local wide stack | per-pop child codes | sync words
_S_WCODE = STACK_W
_S_WPUSH = _S_WCODE + 4 * POP_KW
_SMEM_SLOTS = _S_WPUSH + POP_KW

_W32 = 32  # tiles per bitmask word


def _page_major_kernel(n_tiles, n_items, n_words, with_stats, uniform_o,
                       multi, wcode_rows, wnode_rows, *refs):
    (
        inst_flat_ref,  # SMEM [I*12] f32 quat/pos/inv_scale, flattened
        # (1-D — Mosaic dynamic SMEM indexing is only exercised on one
        # axis anywhere in this codebase; the row is iid*12)
        item_pid_ref,  # SMEM [K] i32: grid step -> page id
        item_iid_ref,  # SMEM [K] i32: grid step -> instance id
        page_tab_ref,  # SMEM [P, 2] i32 (node0, tri0) per PAGE ID
        wanted_ref,  # SMEM [K*W] i32 bitmask, flattened item-order
        any_ref,  # SMEM [K] i32: any tile wants step k's (page, inst)
    ) = refs[:6]
    refs = refs[6:]
    if uniform_o:
        worigin_ref = refs[0]
        dx_ref, dy_ref, dz_ref = refs[1:4]
        refs = refs[4:]
        ox_ref = oy_ref = oz_ref = None
    else:
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = refs[:6]
        refs = refs[6:]
    (
        pwcode_ref,  # ANY [P*wcode_rows, 128] i32 per-page wide codes
        pwnodef_ref,  # ANY [P*wnode_rows, 128] f32 per-page wide records
        gtrif_ref,  # ANY [*, 128] f32 global triangle records (HBM)
    ) = refs[:3]
    rest = refs[3:]
    # NOTE: single-instance scenes carry no inst state — they derive
    # inst = where(tri >= 0, 0, -1) in the wrapper, saving a third
    # resident i32 block per tile (review finding r3); multi-instance
    # scenes add it (initialized -1, set to the item's iid on accept).
    inst_out_ref = None
    if multi:
        inst_out_ref, rest = rest[2], rest[:2] + rest[3:]
    if with_stats:
        (t_out_ref, tri_out_ref, stat_ref,
         smem_ref, wcbuf_ref, wnbuf_ref, tribuf_ref, sem_ref) = rest
    else:
        (t_out_ref, tri_out_ref,
         smem_ref, wcbuf_ref, wnbuf_ref, tribuf_ref, sem_ref) = rest

    k = pl.program_id(0)
    slot = jax.lax.bitwise_and(k, 1)

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (REC_LANES, TILE_L), 0)
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 1)
    sub32 = jax.lax.broadcasted_iota(jnp.int32, (REC32, TILE_L), 0)

    def _page_copies(pid, slot_):
        """Three HBM->VMEM copies for page ``pid`` into buffer half
        ``slot_`` (kernels/paged_wide.py layout; row counts are
        multiples of 8 — the v5e DMA alignment constraint)."""
        tri0 = page_tab_ref[pid, 1]
        trow0 = tri0 // REC_PER_ROW
        return (
            pltpu.make_async_copy(
                pwcode_ref.at[pl.ds(pid * wcode_rows, wcode_rows), :],
                wcbuf_ref.at[pl.ds(slot_ * wcode_rows, wcode_rows), :],
                sem_ref.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                pwnodef_ref.at[pl.ds(pid * wnode_rows, wnode_rows), :],
                wnbuf_ref.at[pl.ds(slot_ * wnode_rows, wnode_rows), :],
                sem_ref.at[slot_, 1],
            ),
            pltpu.make_async_copy(
                gtrif_ref.at[pl.ds(trow0, TRI_ROWS), :],
                tribuf_ref.at[pl.ds(slot_ * TRI_ROWS, TRI_ROWS), :],
                sem_ref.at[slot_, 2],
            ),
        )

    # --- step 0: initialize the resident ray state -------------------
    @pl.when(k == 0)
    def _():
        t_out_ref[:] = jnp.full(t_out_ref.shape, BIG, jnp.float32)
        tri_out_ref[:] = jnp.full(tri_out_ref.shape, -1, jnp.int32)
        if multi:
            inst_out_ref[:] = jnp.full(inst_out_ref.shape, -1, jnp.int32)
        if with_stats:
            stat_ref[:] = jnp.zeros(stat_ref.shape, jnp.int32)

        @pl.when(any_ref[0] == 1)
        def _():
            for cp in _page_copies(item_pid_ref[0], jnp.int32(0)):
                cp.start()

    # --- prefetch the NEXT wanted item's page into the other half ----
    nxt = jnp.minimum(k + 1, n_items - 1)

    @pl.when((k + 1 < n_items) & (any_ref[nxt] == 1))
    def _():
        for cp in _page_copies(item_pid_ref[nxt], 1 - slot):
            cp.start()

    pid = item_pid_ref[k]
    iid = item_iid_ref[k]
    tri0 = page_tab_ref[pid, 1]
    trow_page = tri0 // REC_PER_ROW
    srow = slot * TRI_ROWS
    crow0 = slot * wcode_rows
    nrow0 = slot * wnode_rows

    # this item's instance transform scalars (dynamic 1-D SMEM reads)
    qw = inst_flat_ref[iid * 12 + 0]
    qx = inst_flat_ref[iid * 12 + 1]
    qy = inst_flat_ref[iid * 12 + 2]
    qz = inst_flat_ref[iid * 12 + 3]
    px = inst_flat_ref[iid * 12 + 4]
    py = inst_flat_ref[iid * 12 + 5]
    pz = inst_flat_ref[iid * 12 + 6]
    sx = inst_flat_ref[iid * 12 + 7]
    sy = inst_flat_ref[iid * 12 + 8]
    sz = inst_flat_ref[iid * 12 + 9]

    @pl.when(any_ref[k] == 1)
    def _():
        for cp in _page_copies(pid, slot):
            cp.wait()

        def tile_body(tau, carry0):
            word = wanted_ref[k * n_words + tau // _W32]
            bit = jax.lax.shift_right_logical(
                word, jax.lax.rem(tau, _W32)
            ) & 1

            @pl.when(bit == 1)
            def _():
                r0 = tau * TILE_S
                wdx = dx_ref[pl.ds(r0, TILE_S), :]
                wdy = dy_ref[pl.ds(r0, TILE_S), :]
                wdz = dz_ref[pl.ds(r0, TILE_S), :]
                odx, ody, odz = _quat_rot(qw, qx, qy, qz, wdx, wdy, wdz)
                odx, ody, odz = odx * sx, ody * sy, odz * sz
                if uniform_o:
                    wox = worigin_ref[0]
                    woy = worigin_ref[1]
                    woz = worigin_ref[2]
                else:
                    wox = ox_ref[pl.ds(r0, TILE_S), :]
                    woy = oy_ref[pl.ds(r0, TILE_S), :]
                    woz = oz_ref[pl.ds(r0, TILE_S), :]
                oox, ooy, ooz = _quat_rot(
                    qw, qx, qy, qz, wox - px, woy - py, woz - pz
                )
                oox, ooy, ooz = oox * sx, ooy * sy, ooz * sz

                def _inv(v):
                    tiny = 1e-30
                    safe = jnp.where(
                        jnp.abs(v) < tiny,
                        jnp.where(v < 0, -tiny, tiny), v,
                    )
                    return 1.0 / safe

                idx_, idy_, idz_ = _inv(odx), _inv(ody), _inv(odz)

                def slab(rec, base, t_cap):
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
                    iid if multi else None,
                )
                traverse_inpage = make_inpage_traverser(
                    smem_ref, wcbuf_ref, wnbuf_ref, tribuf_ref,
                    lane1, lane16, sub16, lane32, sub32,
                    slab, test_tri, 0, _S_WCODE, _S_WPUSH,
                )

                best = (
                    t_out_ref[pl.ds(r0, TILE_S), :],
                    tri_out_ref[pl.ds(r0, TILE_S), :],
                    inst_out_ref[pl.ds(r0, TILE_S), :] if multi
                    # inst not tracked (scalar placeholder)
                    else jnp.int32(0),
                )
                best, _, _ = traverse_inpage(
                    tri0, crow0, nrow0, trow_page, srow, best
                )
                t_b, tri_b, in_b = best
                t_out_ref[pl.ds(r0, TILE_S), :] = t_b
                tri_out_ref[pl.ds(r0, TILE_S), :] = tri_b
                if multi:
                    inst_out_ref[pl.ds(r0, TILE_S), :] = in_b
                if with_stats:
                    stat_ref[pl.ds(r0, TILE_S), :] = (
                        stat_ref[pl.ds(r0, TILE_S), :] + 1
                    )

            return carry0  # no carried state; everything flows via refs

        jax.lax.fori_loop(0, n_tiles, tile_body, jnp.int32(0))


def _tile_bounds(scene, dcomps, ocomps, worigin, inst=0):
    """[n_tiles, 12] conservative object-space packet bounds for
    instance ``inst``: origin min/max (6) + clamped reciprocal-direction
    min/max (6). Same per-ray ops as the kernel's transform, widened
    by the standing frustum margins (traversal.py:_frustum_table)."""
    dx, dy, dz = dcomps
    n_tiles = dx.shape[0]
    d = jnp.stack([dx, dy, dz], axis=-1).reshape(n_tiles, TILE, 3)
    quat = T.euler2quat(scene.inst_pose[inst, 3:6])
    pos = scene.inst_pose[inst, 0:3]
    inv_scale = scene.inst_inv_scale[inst]

    od = T.apply_quat(quat, d) * inv_scale
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

    inv_lo, inv_hi = lohi(inv)
    if worigin is not None:
        oo = T.apply_quat(
            quat, jnp.asarray(worigin, jnp.float32) - pos
        ) * inv_scale
        oo = jnp.broadcast_to(oo, (n_tiles, 1, 3))
    else:
        ox, oy, oz = ocomps
        oo = jnp.stack([ox, oy, oz], axis=-1).reshape(n_tiles, TILE, 3)
        oo = T.apply_quat(quat, oo - pos) * inv_scale
    oo_lo, oo_hi = lohi(oo)
    return jnp.concatenate([oo_lo, oo_hi, inv_lo, inv_hi], axis=-1)


def _item_plan(scene, tables, dcomps, ocomps, worigin):
    """Conservative (item, tile) visibility + front-to-back item order,
    where an ITEM is an (instance, page) pair — the multi-instance
    generalization of the r3 single-instance page plan (VERDICT r3
    weak #4). Items enumerate ALL I x P pairs statically (jit-friendly:
    instance/page counts are static, page->mesh ownership is data), and
    pages a given instance's mesh does not own are masked unwanted, so
    their grid steps skip both the DMA and the tile loop.

    Interval-arithmetic slab test of each page's AABB (the page
    subtree's root box) against each tile's packet bounds in THAT
    instance's object space — identical math to the resident kernel's
    frustum mode (traversal.py frustum_words), pure jnp. Returns
    (item_pid [K] i32, item_iid [K] i32, wanted bitmask
    [K, ceil(n_tiles/32)] i32 in order-permuted rows, any [K] i32)
    with K = I * P sorted front-to-back (unwanted items last)."""
    n_tiles = dcomps[0].shape[0]
    node0 = tables.page_tab[:, 0]
    bmin = scene.node_min[node0]  # [P, 3]
    bmax = scene.node_max[node0]
    # out-round: the kernel's in-page slab tests NUDGE-baked boxes; the
    # plan box must reach at least as far (conservative-only cost)
    pad = (bmax - bmin) * jnp.float32(1e-6) + jnp.float32(1e-9)
    bmin = bmin - pad
    bmax = bmax + pad

    # page -> mesh: meshes are concatenated in node-id order
    # (scene.py compile), so ownership is a searchsorted over roots
    page_mesh = (
        jnp.searchsorted(scene.mesh_root, node0, side="right") - 1
    )  # [P]

    n_inst = scene.num_instances
    wanted_parts = []  # per instance: [n_tiles, P]
    near_parts = []
    for i in range(n_inst):
        bounds = _tile_bounds(scene, dcomps, ocomps, worigin, inst=i)
        oo_lo = bounds[:, None, 0:3]  # [n, 1, 3]
        oo_hi = bounds[:, None, 3:6]
        inv_lo = bounds[:, None, 6:9]
        inv_hi = bounds[:, None, 9:12]

        def interval_products(n_lo, n_hi):
            p1 = n_lo * inv_lo
            p2 = n_lo * inv_hi
            p3 = n_hi * inv_lo
            p4 = n_hi * inv_hi
            lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
            hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
            return lo, hi

        t1_lo, t1_hi = interval_products(
            bmin[None] - oo_hi, bmin[None] - oo_lo
        )
        t2_lo, t2_hi = interval_products(
            bmax[None] - oo_hi, bmax[None] - oo_lo
        )
        near_lo = jnp.max(jnp.minimum(t1_lo, t2_lo), axis=-1)  # [n, P]
        far_hi = jnp.min(jnp.maximum(t1_hi, t2_hi), axis=-1)
        owned = (page_mesh == scene.inst_mesh[i])[None]  # [1, P]
        wanted_parts.append((far_hi >= near_lo) & (far_hi > 0.0) & owned)
        near_parts.append(near_lo)

    # [n_tiles, K] in (instance-major, page-minor) item order
    wanted = jnp.concatenate(wanted_parts, axis=1)
    near_lo = jnp.concatenate(near_parts, axis=1)
    n_items = n_inst * tables.page_tab.shape[0]
    item_pid0 = jnp.tile(
        jnp.arange(tables.page_tab.shape[0], dtype=jnp.int32), n_inst
    )
    item_iid0 = jnp.repeat(
        jnp.arange(n_inst, dtype=jnp.int32), tables.page_tab.shape[0]
    )

    # front-to-back: min conservative entry over wanting tiles
    key = jnp.min(
        jnp.where(wanted, near_lo, jnp.float32(jnp.inf)), axis=0
    )  # [K]
    any_t = jnp.any(wanted, axis=0)
    order = jnp.argsort(jnp.where(any_t, key, jnp.float32(jnp.inf)))
    order = order.astype(jnp.int32)

    n_words = -(-n_tiles // _W32)
    pad_t = n_words * _W32 - n_tiles
    wbits = jnp.pad(wanted, ((0, pad_t), (0, 0))).astype(jnp.uint32)
    shifts = jnp.arange(n_words * _W32, dtype=jnp.uint32) % _W32
    words = (wbits.T << shifts[None]).reshape(-1, n_words, _W32)
    words = words.sum(axis=-1).astype(jnp.int32)  # [K, n_words] OR-sum
    return (item_pid0[order], item_iid0[order], words[order],
            any_t[order].astype(jnp.int32))


def _run_paged_major(scene: SceneArrays, tables: PagedTables, tiled,
                     interpret, worigin=None):
    uniform_o = worigin is not None
    if uniform_o:
        dcomps = tiled
        ocomps = None
    else:
        ocomps = tiled[:3]
        dcomps = tiled[3:]
    n_tiles = dcomps[0].shape[0]
    multi = scene.num_instances > 1
    quat = T.euler2quat(scene.inst_pose[:, 3:6])
    pad = jnp.zeros((scene.num_instances, 2), jnp.float32)
    inst_flat = jnp.concatenate(
        [quat, scene.inst_pose[:, 0:3], scene.inst_inv_scale, pad], axis=1
    ).reshape(-1)
    with_stats = _stats_enabled()

    item_pid, item_iid, wanted, any_t = _item_plan(
        scene, tables, dcomps, ocomps, worigin
    )
    n_items = item_pid.shape[0]

    flat = lambda a: a.reshape(n_tiles * TILE_S, TILE_L)
    smem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    vmem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    n_words = wanted.shape[1]
    head = (inst_flat, item_pid, item_iid, tables.page_tab,
            wanted.reshape(-1), any_t)
    head_specs = [smem_whole(a) for a in head]
    rays = tuple(flat(a) for a in dcomps)
    if uniform_o:
        wo = jnp.asarray(worigin, jnp.float32)
        inputs = head + (wo,) + rays + (
            tables.pwcode, tables.pwnodef, tables.gtrif,
        )
        in_specs = (
            head_specs + [smem_whole(wo)]
            + [vmem_whole(a) for a in rays] + [any_spec] * 3
        )
    else:
        rays = tuple(flat(a) for a in ocomps) + rays
        inputs = head + rays + (
            tables.pwcode, tables.pwnodef, tables.gtrif,
        )
        in_specs = (
            head_specs
            + [vmem_whole(a) for a in rays] + [any_spec] * 3
        )

    state_shape = (n_tiles * TILE_S, TILE_L)
    f32s = jax.ShapeDtypeStruct(state_shape, jnp.float32)
    i32s = jax.ShapeDtypeStruct(state_shape, jnp.int32)
    out_shape = (
        (f32s, i32s)
        + ((i32s,) if multi else ())
        + ((i32s,) if with_stats else ())
    )
    state_spec = pl.BlockSpec(
        state_shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _page_major_kernel, n_tiles, n_items, n_words, with_stats,
        uniform_o, multi, tables.wcode_rows, tables.wnode_rows,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_items,),
        in_specs=in_specs,
        out_specs=(state_spec,) * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((_SMEM_SLOTS,), jnp.int32),
            pltpu.VMEM((2 * tables.wcode_rows, TILE_L), jnp.int32),
            pltpu.VMEM((2 * tables.wnode_rows, TILE_L), jnp.float32),
            pltpu.VMEM((2 * TRI_ROWS, TILE_L), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    inst = None
    if multi:
        inst, outs = outs[2], outs[:2] + outs[3:]
    if with_stats:
        t, tri, vis = outs
        _PAGED_STATS["pages"] = vis[::TILE_S, 0]
        _PAGED_STATS["pages_streamed"] = jnp.sum(any_t)
    else:
        t, tri = outs
    unflat = lambda a: a.reshape(n_tiles, TILE_S, TILE_L)
    t = jnp.where(t >= BIG, _FLT_MAX, t)
    if inst is None:
        inst = jnp.where(tri >= 0, 0, -1)
    return unflat(t), unflat(tri), unflat(inst)


def cast_rays_paged_major(scene: SceneArrays, tables: PagedTables,
                          origin, directions, interpret=None):
    """Nearest-hit query with the page-major kernel (tables built with
    wide=True). Same Hit record and ray-layout handling as
    cast_rays_paged. Multi-instance scenes sweep I x P (instance, page)
    items front-to-back — each instance streams its mesh's visible
    pages once per frame (DMA count O(instances x pages), still far
    below the tile-major kernels' O(page visits))."""
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
        t, tri, inst = _run_chunked(scene, tables, tiled, interpret,
                                    worigin)
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
    t, tri, inst = _run_chunked(scene, tables, tiled, interpret, worigin)
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return Hit(t=unpack(t), tri=unpack(tri), inst=unpack(inst))


def _run_chunked(scene, tables, tiled, interpret, worigin):
    """Split frames larger than the VMEM tile cap into chunks, each
    its own page sweep (VMEM holds all chunk ray state + 2 page
    buffers)."""
    n_tiles = tiled[0].shape[0]
    cap = _tile_cap(tables, worigin is not None, _stats_enabled(),
                    scene.num_instances > 1)
    if n_tiles <= cap:
        return _run_paged_major(scene, tables, tiled, interpret, worigin)
    outs = []
    stats_pages, stats_streamed = [], []
    for c0 in range(0, n_tiles, cap):
        chunk = tuple(a[c0:c0 + cap] for a in tiled)
        outs.append(
            _run_paged_major(scene, tables, chunk, interpret, worigin)
        )
        if _stats_enabled():
            # accumulate per-chunk counters (each call overwrites the
            # module dict; merged below so a chunked frame reports the
            # WHOLE frame's visits/DMA traffic)
            stats_pages.append(_PAGED_STATS["pages"])
            stats_streamed.append(_PAGED_STATS["pages_streamed"])
    if _stats_enabled():
        _PAGED_STATS["pages"] = jnp.concatenate(stats_pages)
        _PAGED_STATS["pages_streamed"] = sum(stats_streamed)
    return tuple(
        jnp.concatenate([o[j] for o in outs], axis=0) for j in range(3)
    )
