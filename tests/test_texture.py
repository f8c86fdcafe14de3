"""Texture filtering tests.

``nearest`` is the reference-exact path (raycast.cu:224-240) and is
already pinned by the golden-image tests; here a numpy oracle pins the
``bilinear`` framework extension (texel-center convention, toroidal
wrap) and its equivalence to nearest at texel centers.
"""

import numpy as np

from tpu_raytracer.render import Camera, RenderConfig, render
from tpu_raytracer.render.shade import sample_texture
from tpu_raytracer.scene import (
    Material,
    MeshInstance,
    Scene,
    objloader,
    procgen,
)


def _textured_scene(tex):
    scene = Scene()
    mat = Material()
    mat.set_texture(tex)
    scene.add_material(mat)
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    scene.add_mesh_instance(MeshInstance(0, 0))
    cam = Camera.looking(64, 64, fov_deg=45.0, pose=[0, -4, 0, 0, 0, 0])
    return scene.compile(), cam


def _oracle_bilinear(tex, uv):
    """Straight-line numpy bilinear with the same conventions as
    shade._sample_texture_bilinear (v flipped, centers at (i+0.5)/n,
    toroidal wrap)."""
    h, w = tex.shape[:2]
    u, v = uv[..., 0], uv[..., 1]
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    t = tex.astype(np.float64)
    c00 = t[y0 % h, x0 % w]
    c10 = t[y0 % h, (x0 + 1) % w]
    c01 = t[(y0 + 1) % h, x0 % w]
    c11 = t[(y0 + 1) % h, (x0 + 1) % w]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return (top + (bot - top) * fy) * 0.0039215


def test_bilinear_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    tex = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    arrays, _ = _textured_scene(tex)
    uv = rng.uniform(-1.5, 2.5, size=(257, 2)).astype(np.float32)
    mat = np.zeros(257, np.int32)
    got = np.asarray(sample_texture(arrays, mat, uv, tex_filter="bilinear"))
    want = _oracle_bilinear(tex, uv.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bilinear_equals_nearest_at_texel_centers():
    rng = np.random.default_rng(11)
    tex = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    arrays, _ = _textured_scene(tex)
    # u hits texel center i at (i+0.5)/16; v flipped likewise
    i = np.arange(16)
    u = (i + 0.5) / 16.0
    v = 1.0 - (i + 0.5) / 16.0
    uv = np.stack(np.meshgrid(u, v, indexing="ij"), -1).reshape(-1, 2)
    uv = uv.astype(np.float32)
    mat = np.zeros(len(uv), np.int32)
    near = np.asarray(sample_texture(arrays, mat, uv, tex_filter="nearest"))
    bil = np.asarray(sample_texture(arrays, mat, uv, tex_filter="bilinear"))
    np.testing.assert_allclose(bil, near, atol=1e-6)


def test_bilinear_render_smokes_and_smooths():
    arrays, cam = _textured_scene(procgen.checkerboard_texture(16, 4))
    base = RenderConfig(width=64, height=64, backend="bvh")
    img_n = np.asarray(render(cam, arrays, base))
    import dataclasses

    img_b = np.asarray(
        render(cam, arrays, dataclasses.replace(base, texture_filter="bilinear"))
    )
    assert img_n.shape == img_b.shape == (64, 64, 3)
    # nearest produces only the two checker levels on hit pixels;
    # bilinear must produce intermediate values at checker boundaries
    assert (img_n != img_b).any()
    hit = (img_b != np.array([255, 204, 153], np.uint8)).any(-1)
    vals = np.unique(img_b[hit][..., 0])
    assert len(vals) > len(np.unique(img_n[(img_n != np.array(
        [255, 204, 153], np.uint8)).any(-1)][..., 0]))
