"""Mip-mapped trilinear texture filtering (framework extension —
RenderConfig.texture_filter="trilinear"; reference samples level-0
nearest only, raycast.cu:224-240)."""

import numpy as np

from tpu_raytracer.render import Camera, RenderConfig, render
from tpu_raytracer.render.shade import (
    _sample_texture_bilinear,
    _sample_texture_trilinear,
)
from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen
from tpu_raytracer.scene.scene import _mip_downsample


def test_mip_downsample_chain():
    # 8-squares checkerboard at 64^2 with 8-texel squares: level 3
    # averages each 8x8 block -> the pure 8x8 checkerboard; level 6 is
    # the 1x1 global mean
    tex = procgen.checkerboard_texture(64, 8)
    levels = [tex]
    while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
        levels.append(_mip_downsample(levels[-1]))
    assert [l.shape[0] for l in levels] == [64, 32, 16, 8, 4, 2, 1]
    l3 = levels[3]
    vals = np.unique(l3.reshape(-1, 3), axis=0)
    assert len(vals) == 2  # still pure two-tone at the square scale
    mean = tex.reshape(-1, 3).mean(0)
    np.testing.assert_allclose(
        levels[-1].reshape(3).astype(float), mean, atol=1.0
    )


def _textured_arrays(tex):
    scene = Scene()
    mat = Material()
    mat.set_texture(tex)
    scene.add_material(mat)
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    scene.add_mesh_instance(MeshInstance(0, 0))
    return scene.compile()


def test_trilinear_lod_extremes():
    tex = procgen.checkerboard_texture(64, 8)
    arrays = _textured_arrays(tex)
    uv = np.random.default_rng(3).uniform(0.1, 0.9, (64, 2)).astype(np.float32)
    mat = np.zeros(64, np.int32)

    # tiny footprint -> level 0 -> equals plain bilinear
    small = np.full((64, 2), 1e-6, np.float32)
    got = np.asarray(_sample_texture_trilinear(arrays, mat, uv, small, small))
    want = np.asarray(_sample_texture_bilinear(
        arrays, arrays.mat_tex_start[mat], arrays.mat_tex_w[mat],
        arrays.mat_tex_h[mat], uv,
    ))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # whole-texture footprint -> top (1x1) level -> the global mean
    big = np.full((64, 2), 4.0, np.float32)
    got = np.asarray(_sample_texture_trilinear(arrays, mat, uv, big, big))
    mean = tex.reshape(-1, 3).astype(np.float64).mean(0) / 255.0
    np.testing.assert_allclose(got, np.broadcast_to(mean, got.shape),
                               atol=0.02)


def test_trilinear_render_quiets_minified_texture():
    """A deep receding checkered floor: with nearest filtering the far
    strip aliases (high pixel-to-pixel variance); trilinear must
    average it toward the texture mean."""
    scene = Scene()
    mat = Material()
    mat.set_texture(procgen.checkerboard_texture(128, 32))
    scene.add_material(mat)
    scene.add_mesh(objloader.loads(procgen.board_obj(4.0, 60.0)))
    floor = MeshInstance(0, 0)
    # board faces -y; pitch to face +z (up), stretched away from camera
    floor.pose = np.array([0, 25.0, -1.0, 0, -np.pi / 2, 0], np.float32)
    scene.add_mesh_instance(floor)
    arrays = scene.compile()

    cam = Camera.looking(96, 96, fov_deg=55.0, pose=[0, -4, 0.5, 0, 0, 0])
    imgs = {}
    for f in ("nearest", "trilinear"):
        cfg = RenderConfig(width=96, height=96, backend="bvh",
                           texture_filter=f)
        imgs[f] = np.asarray(render(cam, arrays, cfg)).astype(np.float64)

    # the far strip = upper rows that still hit the floor
    from tpu_raytracer.render.shade import SKY_COLOR

    hit = (imgs["nearest"] != np.array(SKY_COLOR, float)).any(-1)
    rows = np.where(hit.any(1))[0]
    far = rows[: max(len(rows) // 4, 4)]
    def strip_var(img):
        px = img[far][hit[far]][..., 0]
        return float(np.var(px))

    v_near, v_tri = strip_var(imgs["nearest"]), strip_var(imgs["trilinear"])
    assert v_tri < v_near * 0.35, (v_near, v_tri)
