"""À-trous denoiser (render/denoise.py — framework extension; the
reference never enables its path-tracing scaffolding, raycast.cu:190-193,
let alone filters it)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracer.render.denoise import atrous_denoise


def _flat_guides(h, w):
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (h, w, 3))
    depth = jnp.full((h, w), 3.0, jnp.float32)
    return normal, depth


def test_zero_iterations_is_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((16, 16, 3), np.float32))
    n, z = _flat_guides(16, 16)
    out = atrous_denoise(img, n, z, iterations=0)
    assert np.array_equal(np.asarray(out), np.asarray(img))


def test_flat_region_variance_drops_mean_preserved():
    rng = np.random.default_rng(1)
    base = 0.5
    img = jnp.asarray(base + 0.1 * rng.standard_normal((64, 64, 3)).astype(np.float32))
    n, z = _flat_guides(64, 64)
    out = np.asarray(atrous_denoise(img, n, z, iterations=3))
    inner = out[8:-8, 8:-8]
    src = np.asarray(img)[8:-8, 8:-8]
    assert inner.var() < 0.05 * src.var()  # >20x variance reduction
    assert abs(inner.mean() - src.mean()) < 0.01  # energy preserved


def test_edges_preserved_across_depth_normal_boundary():
    rng = np.random.default_rng(2)
    h, w = 64, 64
    img = np.empty((h, w, 3), np.float32)
    img[:, : w // 2] = 0.2
    img[:, w // 2:] = 0.9
    img += 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[:, : w // 2, 2] = 1.0  # facing +z
    normal[:, w // 2:, 0] = 1.0  # facing +x
    depth = np.full((h, w), 2.0, np.float32)
    depth[:, w // 2:] = 6.0
    out = np.asarray(
        atrous_denoise(jnp.asarray(img), jnp.asarray(normal),
                       jnp.asarray(depth), iterations=3)
    )
    # each side keeps its own level: no cross-edge bleed
    assert abs(out[:, : w // 2 - 4].mean() - 0.2) < 0.02
    assert abs(out[:, w // 2 + 4:].mean() - 0.9) < 0.02
    # and each side is actually smoothed
    assert out[:, : w // 2 - 4].std() < 0.02


def test_miss_pixels_do_not_nan():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((32, 32, 3), np.float32))
    normal = jnp.zeros((32, 32, 3), jnp.float32)  # all-miss guides
    depth = jnp.full((32, 32), jnp.inf, jnp.float32)
    out = np.asarray(atrous_denoise(img, normal, depth, iterations=2))
    assert np.isfinite(out).all()


def test_jits_and_end_to_end_path_mode():
    import sys

    sys.path.insert(0, "tests")
    from test_render import cube_scene

    from tpu_raytracer.render import RenderConfig
    from tpu_raytracer.render.pipeline import render_image_path_traced

    arrays, cam = cube_scene()
    p = cam.ray_params()
    key = jax.random.PRNGKey(0)
    base = RenderConfig(width=cam.width, height=cam.height, backend="bvh")
    import dataclasses

    den = dataclasses.replace(base, denoise=2)
    img0 = np.asarray(render_image_path_traced(
        base, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"], key,
        max_bounces=1, samples=1,
    ))
    img1 = np.asarray(render_image_path_traced(
        den, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"], key,
        max_bounces=1, samples=1,
    ))
    assert img1.shape == img0.shape and img1.dtype == np.uint8
    assert (img0 != img1).any()  # the filter did something
