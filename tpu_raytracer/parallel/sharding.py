"""Multi-chip rendering: data-parallel image tiling over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2 parallelism table);
its only parallel axis is pixels. The TPU-native scale-out keeps that
axis: the pixel-ray batch is sharded across a 1-D ``Mesh`` via
``shard_map`` (image rows in PIX_TILE blocks), the flat scene arrays are
replicated to every chip, and each chip runs the full raygen -> traverse
-> shade pipeline on its shard. No collectives are needed in the render
loop — assembly happens when the sharded uint8 image is fetched (the
``all_gather``/download analog of kernel.cu:37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.traversal import PIX_H
from ..render.camera import generate_rays
from ..render.pipeline import RenderConfig
from ..render.renderer import get_cast_fn, hit_attributes
from ..render.shade import shade_primary
from ..scene.scene import SceneArrays


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def _shard_body(config: RenderConfig, scene: SceneArrays, origin, directions):
    """Per-chip slice of the render pipeline (runs under shard_map)."""
    cast = get_cast_fn(config.backend)
    hit = cast(scene, origin, directions)
    attrs = hit_attributes(scene, origin, directions, hit, exact=config.exact_math)
    return shade_primary(
        scene, attrs, config.light_direction, config.lighting,
        exact=config.exact_math, backend=config.backend,
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def render_image_sharded(
    config: RenderConfig,
    mesh: Mesh,
    scene: SceneArrays,
    K_inv: jax.Array,
    D: jax.Array,
    pose: jax.Array,
    inv_pose: jax.Array,
) -> jax.Array:
    """Render one frame with image rows sharded over ``mesh``.

    Row constraint: H must be divisible by n_devices. When each chip's
    shard height is ALSO a multiple of PIX_H, shards render on the
    coherent 2D-tile packet path; otherwise they silently take the
    flat-chunk path (correct, slower) — so heights that are a multiple
    of n * PIX_H are recommended for performance.
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    if config.height % n != 0:
        raise ValueError(
            f"height {config.height} not divisible by {n} devices"
        )
    origin, directions = generate_rays(
        config.width, config.height, K_inv, D, pose, inv_pose,
        exact=config.exact_math,
    )
    directions = jax.lax.with_sharding_constraint(
        directions, NamedSharding(mesh, P(axis, None, None))
    )
    body = functools.partial(_shard_body, config)
    origin_b = jnp.broadcast_to(origin, directions.shape)
    img = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None, None),
    )(scene, origin_b, directions)
    return img
