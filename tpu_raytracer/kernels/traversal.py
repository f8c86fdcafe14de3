"""Pallas TPU packet BVH traversal — the render hot path.

TPU-native redesign of the reference's per-thread divergent stack walk
(raycast.cu:54-138). A CUDA thread owns one ray and one stack; a TPU
core owns a PACKET of TILE_S x TILE_L = 8 x 128 = 1024 coherent rays
(one 32 x 32 pixel block) and ONE shared node stack in SMEM:

  * the scalar core pops a node and decides descent order;
  * the VPU tests the node's child AABBs against all 1024 rays at once
    (dense [8, 128] slab tests);
  * a child is descended if ANY lane's entry distance beats its current
    best (packet traversal a la CPU-SIMD ray tracing);
  * leaves run dense masked plane + barycentric triangle tests across
    the whole tile, one triangle (broadcast scalars) per step.

Memory-layout constraints (probed on this TPU generation): VMEM allows
dynamic indexing on the SUBLANE dim but not the lane dim, and SMEM
scalar tables cap out ~256KB. So all per-node / per-triangle fields are
packed as [ceil(N/128), 128] VMEM arrays and fetched with one
dynamic-sublane row load + a one-hot lane mask + reduce; control
scalars round-trip through an SMEM scratchpad to reach the scalar core.
Both children's AABBs are stored indexed BY PARENT so one row+mask
fetches the whole node record.

The whole SoA scene stays resident in VMEM across the ray-tile grid
(bunny-class is a few MB of the ~16MB budget), so traversal never
touches HBM after the first tile. The reference's two optimizations
are preserved: ordered near-child-first descent and t-pruning
(raycast.cu:69-79), plus one improvement: t_best carries ACROSS
instances, pruning later instances by earlier hits.

Outputs the same compact (t, tri, inst) hit record as the XLA backends
(renderer.py), so attribute reconstruction and shading are shared.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import transforms as T
from ..scene.scene import SceneArrays

TILE_S = 8  # sublanes
TILE_L = 128  # lanes
TILE = TILE_S * TILE_L  # rays per packet
PIX_TILE = 32  # 32x32 pixel block -> one packet
STACK_SIZE = 48  # max BVH depth 32 (MeshPrimitive.cpp:54) + slack
# Python floats so they inline as literals (jnp scalars would be
# captured as unsupported kernel constants).
BIG = 3.0e38
PARALLEL_EPS = 1e-6
_FLT_MAX = 3.4028235e38

# SMEM scratch slot map
_S_SP = STACK_SIZE  # loop stack pointer (unused slot kept for clarity)
_S_CA, _S_CB, _S_LS, _S_LC = STACK_SIZE + 1, STACK_SIZE + 2, STACK_SIZE + 3, STACK_SIZE + 4
_SMEM_SLOTS = STACK_SIZE + 8


def _quat_rot(qw, qx, qy, qz, vx, vy, vz):
    """apply_quat (transforms.hpp:165-176) on [8,128] component tiles
    with broadcast quaternion parts."""
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
    # --- scalar (SMEM) inputs ---
    inst_tab_ref,  # [I, 12] f32: quat(4) xyz(3) inv_scale(3) pad(2)
    inst_root_ref,  # [I] i32 root node id
    # --- ray tile (VMEM) ---
    ox_ref, oy_ref, oz_ref,  # [1, 8, 128] f32
    dx_ref, dy_ref, dz_ref,
    # --- packed node records, indexed by PARENT node id [Rn, 128] ---
    n_ca_ref, n_cb_ref, n_ls_ref, n_lc_ref,  # i32
    ca_minx_ref, ca_miny_ref, ca_minz_ref,  # f32: child A box
    ca_maxx_ref, ca_maxy_ref, ca_maxz_ref,
    cb_minx_ref, cb_miny_ref, cb_minz_ref,  # f32: child B box
    cb_maxx_ref, cb_maxy_ref, cb_maxz_ref,
    # --- packed triangle SoA [Rt, 128] f32 ---
    v0x_ref, v0y_ref, v0z_ref,
    v1x_ref, v1y_ref, v1z_ref,
    v2x_ref, v2y_ref, v2z_ref,
    nx_ref, ny_ref, nz_ref,
    # --- outputs [1, 8, 128] ---
    t_out_ref, tri_out_ref, inst_out_ref,
    # --- scratch ---
    smem_ref,  # SMEM [_SMEM_SLOTS] i32: stack + control scalars
):
    wox = ox_ref[0]
    woy = oy_ref[0]
    woz = oz_ref[0]
    wdx = dx_ref[0]
    wdy = dy_ref[0]
    wdz = dz_ref[0]

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_L), 1)

    def fetch_mask(k):
        """(row, one-hot lane mask) for packed-array element k."""
        return k // TILE_L, lane_iota == (k % TILE_L)

    def fetch_f(ref, row, mask):
        """One f32 element as a [1, 1] broadcastable value."""
        return jnp.sum(
            jnp.where(mask, ref[pl.ds(row, 1), :], 0.0), axis=1, keepdims=True
        )

    def fetch_i(ref, row, mask, slot):
        """One i32 element, round-tripped through SMEM to the scalar
        core (vector-reduced values can't drive control flow directly)."""
        smem_ref[slot] = jnp.sum(jnp.where(mask, ref[pl.ds(row, 1), :], 0))
        return smem_ref[slot]

    t_best = jnp.full((TILE_S, TILE_L), BIG, jnp.float32)
    tri_best = jnp.full((TILE_S, TILE_L), -1, jnp.int32)
    inst_best = jnp.full((TILE_S, TILE_L), -1, jnp.int32)

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

        # Object-space ray (raycast.cu:32-51)
        odx, ody, odz = _quat_rot(qw, qx, qy, qz, wdx, wdy, wdz)
        odx, ody, odz = odx * sx, ody * sy, odz * sz
        oox, ooy, ooz = _quat_rot(qw, qx, qy, qz, wox - px, woy - py, woz - pz)
        oox, ooy, ooz = oox * sx, ooy * sy, ooz * sz
        idx_ = 1.0 / odx
        idy_ = 1.0 / ody
        idz_ = 1.0 / odz

        def packet_entry(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, t_cap):
            """Packet slab test (BVHTree.hpp:40-54) against one box given
            as [1,1] broadcast scalars; returns min active entry or BIG."""
            t1x = (bminx - oox) * idx_
            t2x = (bmaxx - oox) * idx_
            t1y = (bminy - ooy) * idy_
            t2y = (bmaxy - ooy) * idy_
            t1z = (bminz - ooz) * idz_
            t2z = (bmaxz - ooz) * idz_
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            hit = (far >= near) & (far > 0.0) & (near < t_cap)
            return jnp.min(jnp.where(hit, near, BIG))

        def leaf_fn(args):
            node, row, mask, sp, t_b, tri_b, in_b = args
            start = fetch_i(n_ls_ref, row, mask, _S_LS)
            count = fetch_i(n_lc_ref, row, mask, _S_LC)

            def tri_body(k, acc):
                t_b, tri_b, in_b = acc
                trow, tmask = fetch_mask(k)
                ax = fetch_f(v0x_ref, trow, tmask)
                ay = fetch_f(v0y_ref, trow, tmask)
                az = fetch_f(v0z_ref, trow, tmask)
                nx = fetch_f(nx_ref, trow, tmask)
                ny = fetch_f(ny_ref, trow, tmask)
                nz = fetch_f(nz_ref, trow, tmask)
                # plane hit (TrianglePrimitive.hpp:62-79); accept test
                # denom <= -eps folds in the backface cull
                # (raycast.cu:107-109)
                denom = odx * nx + ody * ny + odz * nz
                safe = jnp.where(jnp.abs(denom) < PARALLEL_EPS, 1.0, denom)
                t = ((ax - oox) * nx + (ay - ooy) * ny + (az - ooz) * nz) / safe
                pxl = oox + t * odx
                pyl = ooy + t * ody
                pzl = ooz + t * odz
                bx = fetch_f(v1x_ref, trow, tmask)
                by = fetch_f(v1y_ref, trow, tmask)
                bz = fetch_f(v1z_ref, trow, tmask)
                cx = fetch_f(v2x_ref, trow, tmask)
                cy = fetch_f(v2y_ref, trow, tmask)
                cz = fetch_f(v2z_ref, trow, tmask)
                # barycentric (TrianglePrimitive.hpp:151-169):
                # e0 = C - A, e1 = B - A, e2 = P - A
                e0x, e0y, e0z = cx - ax, cy - ay, cz - az
                e1x, e1y, e1z = bx - ax, by - ay, bz - az
                e2x, e2y, e2z = pxl - ax, pyl - ay, pzl - az
                dot00 = e0x * e0x + e0y * e0y + e0z * e0z
                dot01 = e0x * e1x + e0y * e1y + e0z * e1z
                dot11 = e1x * e1x + e1y * e1y + e1z * e1z
                dot02 = e0x * e2x + e0y * e2y + e0z * e2z
                dot12 = e1x * e2x + e1y * e2y + e1z * e2z
                inv_den = 1.0 / (dot00 * dot11 - dot01 * dot01)
                u = (dot11 * dot02 - dot01 * dot12) * inv_den
                v = (dot00 * dot12 - dot01 * dot02) * inv_den
                ok = (
                    (denom <= -PARALLEL_EPS)
                    & (t >= 0.0)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t < t_b)
                )
                return (
                    jnp.where(ok, t, t_b),
                    jnp.where(ok, k, tri_b),
                    jnp.where(ok, i, in_b),
                )

            acc = jax.lax.fori_loop(start, start + count, tri_body, (t_b, tri_b, in_b))
            return (sp,) + acc

        def internal_fn(args):
            node, row, mask, sp, t_b, tri_b, in_b = args
            ca = fetch_i(n_ca_ref, row, mask, _S_CA)
            cb = fetch_i(n_cb_ref, row, mask, _S_CB)
            da = packet_entry(
                fetch_f(ca_minx_ref, row, mask), fetch_f(ca_miny_ref, row, mask),
                fetch_f(ca_minz_ref, row, mask), fetch_f(ca_maxx_ref, row, mask),
                fetch_f(ca_maxy_ref, row, mask), fetch_f(ca_maxz_ref, row, mask),
                t_b,
            )
            db = packet_entry(
                fetch_f(cb_minx_ref, row, mask), fetch_f(cb_miny_ref, row, mask),
                fetch_f(cb_minz_ref, row, mask), fetch_f(cb_maxx_ref, row, mask),
                fetch_f(cb_maxy_ref, row, mask), fetch_f(cb_maxz_ref, row, mask),
                t_b,
            )
            # Ordered push: far child first, near child last so it pops
            # first (raycast.cu:72-79), packet-wide ordering heuristic.
            a_near = da <= db
            far = jnp.where(a_near, cb, ca)
            d_far = jnp.where(a_near, db, da)
            near = jnp.where(a_near, ca, cb)
            d_near = jnp.where(a_near, da, db)
            smem_ref[sp] = far
            sp = sp + (d_far < BIG).astype(jnp.int32)
            smem_ref[sp] = near
            sp = sp + (d_near < BIG).astype(jnp.int32)
            return sp, t_b, tri_b, in_b

        def body(carry):
            sp, t_b, tri_b, in_b = carry
            sp = sp - 1
            node = smem_ref[sp]
            row, mask = fetch_mask(node)
            ca = fetch_i(n_ca_ref, row, mask, _S_CA)
            return jax.lax.cond(
                ca < 0, leaf_fn, internal_fn,
                (node, row, mask, sp, t_b, tri_b, in_b),
            )

        smem_ref[0] = inst_root_ref[i]
        carry = (jnp.int32(1), t_best, tri_best, inst_best)
        _, t_best, tri_best, inst_best = jax.lax.while_loop(
            lambda c: c[0] > 0, body, carry
        )

    t_out_ref[0] = jnp.where(t_best >= BIG, _FLT_MAX, t_best)
    tri_out_ref[0] = tri_best
    inst_out_ref[0] = inst_best


def _pack128(a: jax.Array, fill) -> jax.Array:
    """Pad a 1-D array to a multiple of 128 and reshape [R, 128]."""
    n = a.shape[0]
    pad = (-n) % TILE_L
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(-1, TILE_L)


def _scene_kernel_inputs(scene: SceneArrays):
    """Derive the kernel's packed arrays from SceneArrays (pure jnp,
    fused into the surrounding jit)."""
    quat = T.euler2quat(scene.inst_pose[:, 3:6])
    pad = jnp.zeros((scene.num_instances, 2), jnp.float32)
    inst_tab = jnp.concatenate(
        [quat, scene.inst_pose[:, 0:3], scene.inst_inv_scale, pad], axis=1
    )
    inst_root = scene.mesh_root[scene.inst_mesh]

    # Child boxes indexed by parent: one fetch row covers the whole node.
    ca = jnp.maximum(scene.node_child_a, 0)
    cb = jnp.maximum(scene.node_child_b, 0)
    child_boxes = []
    for c in (ca, cb):
        mn = scene.node_min[c]
        mx = scene.node_max[c]
        child_boxes += [mn[:, 0], mn[:, 1], mn[:, 2], mx[:, 0], mx[:, 1], mx[:, 2]]

    node_arrays = tuple(
        _pack128(a, -1)
        for a in (
            scene.node_child_a, scene.node_child_b,
            scene.node_leaf_start, scene.node_leaf_count,
        )
    ) + tuple(_pack128(a, 0.0) for a in child_boxes)

    comps = lambda m: (m[:, 0], m[:, 1], m[:, 2])
    tri_fields = (
        comps(scene.tri_v0) + comps(scene.tri_v1) + comps(scene.tri_v2)
        + comps(scene.tri_normal)
    )
    tri_arrays = tuple(_pack128(a, 0.0) for a in tri_fields)
    return (inst_tab, inst_root), node_arrays, tri_arrays


def _image_to_tiles(arr: jax.Array) -> jax.Array:
    """[H, W] -> [n_tiles, 8, 128] where each tile is one PIX_TILE^2
    pixel block (coherent packets). H, W must be multiples of PIX_TILE."""
    h, w = arr.shape
    a = arr.reshape(h // PIX_TILE, PIX_TILE, w // PIX_TILE, PIX_TILE)
    a = a.transpose(0, 2, 1, 3).reshape(-1, TILE_S, TILE_L)
    return a


def _tiles_to_image(tiles: jax.Array, h: int, w: int) -> jax.Array:
    a = tiles.reshape(h // PIX_TILE, w // PIX_TILE, PIX_TILE, PIX_TILE)
    return a.transpose(0, 2, 1, 3).reshape(h, w)


def _run_kernel(scene: SceneArrays, tiled, interpret: bool):
    """Invoke the pallas traversal over [n_tiles, 8, 128] ray tiles."""
    ox, oy, oz, dx, dy, dz = tiled
    n_tiles = ox.shape[0]
    (inst_tab, inst_root), node_arrays, tri_arrays = _scene_kernel_inputs(scene)

    ray_spec = pl.BlockSpec(
        (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vmem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    smem_whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )

    inputs = (inst_tab, inst_root, ox, oy, oz, dx, dy, dz, *node_arrays, *tri_arrays)
    in_specs = (
        [smem_whole(inst_tab), smem_whole(inst_root)]
        + [ray_spec] * 6
        + [vmem_whole(a) for a in node_arrays]
        + [vmem_whole(a) for a in tri_arrays]
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
    )
    kernel = functools.partial(_traversal_kernel, scene.num_instances)
    t, tri, inst = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((_SMEM_SLOTS,), jnp.int32)],
        interpret=interpret,
    )(*inputs)
    return t, tri, inst


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def cast_rays_pallas(scene: SceneArrays, origin, directions, interpret=None):
    """Nearest-hit query with the packet kernel. Accepts [H, W, 3]
    directions (tiled as 32x32 coherent pixel blocks) or flat [..., 3]
    (chunked linearly). Returns the same Hit record as the XLA backends.
    """
    from ..render.renderer import Hit  # local import to avoid cycle

    if interpret is None:
        interpret = not _on_tpu()
    directions = jnp.asarray(directions, jnp.float32)
    origin = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), directions.shape)
    shape = directions.shape[:-1]

    use_2d = (
        len(shape) == 2
        and shape[0] % PIX_TILE == 0
        and shape[1] % PIX_TILE == 0
    )
    if use_2d:
        h, w = shape
        tiled = tuple(
            _image_to_tiles(a[..., c]) for a, c in
            [(origin, 0), (origin, 1), (origin, 2),
             (directions, 0), (directions, 1), (directions, 2)]
        )
        t, tri, inst = _run_kernel(scene, tiled, interpret)
        return Hit(
            t=_tiles_to_image(t, h, w),
            tri=_tiles_to_image(tri, h, w),
            inst=_tiles_to_image(inst, h, w),
        )

    flat_o = origin.reshape(-1, 3)
    flat_d = directions.reshape(-1, 3)
    r = flat_o.shape[0]
    pad = (-r) % TILE
    if pad:
        flat_o = jnp.concatenate([flat_o, jnp.broadcast_to(flat_o[-1:], (pad, 3))])
        flat_d = jnp.concatenate([flat_d, jnp.broadcast_to(flat_d[-1:], (pad, 3))])
    tiled = tuple(
        a[:, c].reshape(-1, TILE_S, TILE_L)
        for a, c in [(flat_o, 0), (flat_o, 1), (flat_o, 2),
                     (flat_d, 0), (flat_d, 1), (flat_d, 2)]
    )
    t, tri, inst = _run_kernel(scene, tiled, interpret)
    unpack = lambda a: a.reshape(-1)[:r].reshape(shape)
    return Hit(t=unpack(t), tri=unpack(tri), inst=unpack(inst))
