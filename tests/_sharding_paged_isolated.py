"""shard_map x HBM-paged kernels (interpret) — fresh-interpreter half.

Run by ``test_sharding.py::test_sharded_render_paged_interpret``
through a subprocess: XLA:CPU segfaults while COMPILING this exact
shard_map-over-paged-interpret program late in a long-lived full-suite
process (observed twice, deterministically at the same collection
point, inside ``backend_compile_and_load``), while the identical
program compiles and passes in a fresh process (this file standalone:
green) — accumulated in-process compiler/JIT state in the parent, not
a program bug. The file name has no ``test_`` prefix so the full suite
collects it only via the subprocess wrapper; running it directly with
``pytest tests/_sharding_paged_isolated.py`` works too (explicit paths
are always collected, and tests/conftest.py still applies).
"""

import dataclasses

import jax
import numpy as np
import pytest

from tpu_raytracer.parallel import make_mesh, render_image_sharded
from tpu_raytracer.render import RenderConfig
from tpu_raytracer.render.camera import Camera


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.parametrize("major", [False, True])
def test_sharded_render_paged_interpret_isolated(monkeypatch, major):
    """The big-scene paged path composes with the mesh axis split, for
    both the tile-major and the page-major (TRT_PAGED_MAJOR=1)
    kernels; sharded == single-shard bit-exact."""
    from test_render import sphere_scene
    from tpu_raytracer.kernels.paged import prepare_paged

    if major:
        monkeypatch.setenv("TRT_PAGED_MAJOR", "1")
    arrays, _ = sphere_scene(subdiv=2)  # 320 tris, one instance
    tables = prepare_paged(arrays, page_tris=32, page_nodes=64, wide=True)
    arrays = dataclasses.replace(arrays, paged=tables)
    cam = Camera.looking(64, 64, fov_deg=40.0,
                         pose=[0.2, -3.5, 0.1, 0, 0, 0])
    config = RenderConfig(width=64, height=64, backend="paged")
    p = cam.ray_params()
    img_sharded = np.asarray(render_image_sharded(
        config, make_mesh(4), arrays, p["K_inv"], p["D"], p["pose"],
        p["inv_pose"],
    ))
    img_single = np.asarray(render_image_sharded(
        config, make_mesh(1), arrays, p["K_inv"], p["D"], p["pose"],
        p["inv_pose"],
    ))
    np.testing.assert_array_equal(img_sharded, img_single)
