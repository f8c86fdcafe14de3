"""Coherence-sorted nearest-hit casts for secondary rays.

The packet kernel (kernels/traversal.py) amortizes its per-node cost
over 4096-ray packets, which only pays off when the packet's rays
traverse similar node sets. Primary rays get that for free (pixel
blocks); SECONDARY rays — shadow casts from hit points, reflection
bounces, cosine-sampled path-tracer bounces — arrive in pixel order but
with scattered origins/directions, so each packet's traversal becomes
the union of thousands of unrelated node sets (PERF_LOG r1: whitted
secondary casts ran at ~1/4 the primary rate).

``cast_rays_sorted`` restores coherence by sorting the flat ray batch
by a (origin-morton-major, direction-octant, origin-morton-minor) key
before chunking into packets, then scattering the hit records back to
ray order. The key puts spatial locality in the top bits (rays starting
near each other share the top of the tree regardless of direction) and
splits each locale by direction octant (the reference-free analog of
wavefront ray sorting in GPU path tracers).

Everything is jit-friendly: quantization bounds come from the batch
itself via stop_gradient-free min/max, the sort is one jnp.argsort on
an int32 key, and the inverse permutation is a scatter.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _part_bits10(x: jax.Array) -> jax.Array:
    """Spread 10 bits of x so there are two zero bits between each
    (the classic morton/BMI-free interleave)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton30(q: jax.Array) -> jax.Array:
    """[N, 3] int32 in [0, 1024) -> 30-bit morton code."""
    return (
        _part_bits10(q[..., 0])
        | (_part_bits10(q[..., 1]) << 1)
        | (_part_bits10(q[..., 2]) << 2)
    )


def ray_sort_keys(origin: jax.Array, directions: jax.Array) -> jax.Array:
    """int32 coherence key per ray: origin morton (top 15 bits),
    direction octant (3 bits), origin morton fine (low 15 bits).

    TRT_SORT_KEY=octant flips to octant-MAJOR (octant top, full origin
    morton below): the wide kernel ranks a pop's children by the
    PACKET-min entry distance, so direction-pure packets descend
    near-first for every ray while mixed packets descend in an order
    optimal for nobody — the A/B knob tests which matters more for
    incoherent bounce casts."""
    lo = jnp.min(origin, axis=tuple(range(origin.ndim - 1)))
    hi = jnp.max(origin, axis=tuple(range(origin.ndim - 1)))
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((origin - lo) * scale, 0.0, 1023.0).astype(jnp.int32)
    m = morton30(q)
    octant = (
        (directions[..., 0] < 0).astype(jnp.int32)
        + 2 * (directions[..., 1] < 0).astype(jnp.int32)
        + 4 * (directions[..., 2] < 0).astype(jnp.int32)
    )
    if os.environ.get("TRT_SORT_KEY") == "octant":
        return (octant << 28) | (m >> 2)
    return ((m >> 15) << 18) | (octant << 15) | (m & 0x7FFF)


def secondary_cast_fn(cast, backend: str, sort_secondary: bool = False):
    """Wrap a nearest-hit backend with coherence sorting for secondary
    (shadow/bounce) rays. Only the packet kernel could benefit — the
    XLA per-ray walk is order-independent — so other backends pass
    through.

    DEFAULT OFF (round-2 TPU A/B): secondary casts keep the image
    shape, so they already ride the kernel's 64x64 pixel-tile path with
    coherent origins; the argsort+gather+scatter cost HALVED the
    cornell-shadow and whitted configs (53 vs 103 fps, 12 vs 28 fps)
    and gains nothing back. TRT_SORT_SECONDARY=1 forces it on for
    experiments; =0 forces off."""
    env = os.environ.get("TRT_SORT_SECONDARY")
    if env is not None:
        sort_secondary = env != "0"
    if sort_secondary and backend == "pallas":
        return lambda scene, o, d: cast_rays_sorted(cast, scene, o, d)
    return cast


def cast_rays_sorted(cast_fn, scene, origin, directions):
    """Run ``cast_fn`` over the ray batch in coherence-sorted order and
    return hits in the original ray order. Shapes/semantics identical
    to the unsorted cast (the sort is a pure permutation)."""
    from .renderer import Hit

    directions = jnp.asarray(directions, jnp.float32)
    origin = jnp.broadcast_to(
        jnp.asarray(origin, jnp.float32), directions.shape
    )
    shape = directions.shape[:-1]
    flat_o = origin.reshape(-1, 3)
    flat_d = directions.reshape(-1, 3)

    keys = ray_sort_keys(flat_o, flat_d)
    order = jnp.argsort(keys)
    hit = cast_fn(scene, flat_o[order], flat_d[order])

    unscatter = lambda a: (
        None if a is None
        else jnp.zeros_like(a).at[order].set(a).reshape(
            shape + a.shape[1:]  # Hit.n carries a trailing [3]
        )
    )
    return Hit(*(unscatter(a) for a in hit))


# Terminated-lane parking spot: origin far outside every scene with a
# direction pointing away, so the packet kernel's root box test rejects
# the lane immediately and an ALL-terminated 4096-ray tile traverses
# nothing. Re-casting terminated rays unchanged (the naive masked
# wavefront) pays full traversal for dead lanes; parking makes bounce
# cost track the LIVE ray population, which collapses tile-by-tile as
# sky/termination regions cluster. slab: t = (box - 1e9) * 1 < 0 on
# every axis => far < 0 => miss, no inf/NaN anywhere.
PARK_ORIGIN = 1.0e9
PARK_DIRECTION = (1.0, 1.0, 1.0)


def park_dead_rays(o, d, live):
    """Replace dead lanes' rays with the guaranteed-miss parked ray;
    live lanes pass through unchanged."""
    keep = live[..., None]
    return (
        jnp.where(keep, o, PARK_ORIGIN),
        jnp.where(keep, d, jnp.asarray(PARK_DIRECTION, jnp.float32)),
    )
