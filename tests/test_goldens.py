"""Golden-image regression tests for all five BASELINE.md configs
(SURVEY §4 item 4) — small CPU-runnable variants, exact equality.

The brute-oracle tests prove backend agreement; goldens additionally
catch oracle+kernel co-drift (a change that moves both together).

Regenerate after an INTENDED image change:

    python -m pytest tests/test_goldens.py --help  # (no flag needed)
    env -u PYTHONPATH JAX_PLATFORMS=cpu python tests/test_goldens.py regen
"""

import os

import jax
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _render_config1_cube():
    from tpu_raytracer.app.scenes import scene_cube
    from tpu_raytracer.render import RenderConfig
    from tpu_raytracer.render.pipeline import render_image

    arrays, cam = scene_cube(64)
    cfg = RenderConfig(cam.width, cam.height, backend="bvh")
    p = cam.ray_params()
    return np.asarray(render_image(
        cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]))


def _render_config2_cornell():
    from tpu_raytracer.app.scenes import scene_cornell
    from tpu_raytracer.render import RenderConfig
    from tpu_raytracer.render.pipeline import render_image

    arrays, cam = scene_cornell(64)
    cfg = RenderConfig(cam.width, cam.height, backend="bvh",
                       lighting="lambert_shadow")
    p = cam.ray_params()
    return np.asarray(render_image(
        cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]))


def _render_config3_bunny():
    from tpu_raytracer.app.scenes import scene_bunny
    from tpu_raytracer.render import RenderConfig
    from tpu_raytracer.render.pipeline import render_image

    # subdivisions=4 -> ~5k-tri blob: same multi-level BVH shape class
    # as the 82k flagship, CPU-fast
    arrays, cam = scene_bunny(96, 96, subdivisions=4)
    cfg = RenderConfig(cam.width, cam.height, backend="bvh",
                       lighting="blinn_phong")
    p = cam.ray_params()
    return np.asarray(render_image(
        cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]))


def _render_config4_instances():
    from tpu_raytracer.app.scenes import scene_instances
    from tpu_raytracer.render import RenderConfig
    from tpu_raytracer.render.pipeline import render_image_whitted

    arrays, cam = scene_instances(64, 64)
    cfg = RenderConfig(cam.width, cam.height, backend="bvh")
    p = cam.ray_params()
    return np.asarray(render_image_whitted(
        cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]))


def _render_config5_colonnade_path():
    from tpu_raytracer.app.scenes import scene_colonnade
    from tpu_raytracer.render import RenderConfig
    from tpu_raytracer.render.pipeline import render_image_path_traced

    # 4x4 columns x 8 segments ~ 5k tris; 2spp x 3 casts, fixed key
    arrays, cam = scene_colonnade(64, 64, columns=4, segs=8)
    cfg = RenderConfig(cam.width, cam.height, backend="bvh")
    p = cam.ray_params()
    return np.asarray(render_image_path_traced(
        cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"],
        jax.random.PRNGKey(7), 2, 2))


GOLDENS = {
    "config1_cube_64": _render_config1_cube,
    "config2_cornell_64": _render_config2_cornell,
    "config3_bunny_96": _render_config3_bunny,
    "config4_instances_whitted_64": _render_config4_instances,
    "config5_colonnade_path_64": _render_config5_colonnade_path,
}


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, name + ".npy")
    assert os.path.exists(path), (
        f"missing golden {path}; regenerate with "
        "`env -u PYTHONPATH JAX_PLATFORMS=cpu python tests/test_goldens.py regen`"
    )
    img = GOLDENS[name]()
    golden = np.load(path)
    np.testing.assert_array_equal(img, golden)


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in GOLDENS.items():
        img = fn()
        assert img.dtype == np.uint8 and img.ndim == 3, (name, img.dtype, img.shape)
        np.save(os.path.join(GOLDEN_DIR, name + ".npy"), img)
        print(f"wrote {name}.npy {img.shape} mean={img.mean():.2f}")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        # force true-CPU determinism regardless of shell presets
        assert jax.default_backend() == "cpu", (
            "goldens must be generated on CPU: run with "
            "`env -u PYTHONPATH JAX_PLATFORMS=cpu`"
        )
        regen()
    else:
        print(__doc__)
