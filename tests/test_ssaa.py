"""Supersampled anti-aliasing (RenderConfig.ssaa — framework extension;
the reference shoots exactly one ray per pixel, raycast.cu:147-152)."""

import dataclasses

import numpy as np

from tpu_raytracer.render import Camera, RenderConfig, render
from tpu_raytracer.render.shade import SKY_COLOR
from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen


def _cube(size=48):
    scene = Scene()
    scene.add_material(Material(albedo=(0.1, 0.2, 0.9)))
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    scene.add_mesh_instance(MeshInstance(0, 0))
    cam = Camera.looking(size, size, fov_deg=45.0, pose=[0, -4, 0, 0, 0, 0])
    return scene.compile(), cam


def test_ssaa_smooths_silhouette_and_keeps_interior():
    arrays, cam = _cube()
    base = RenderConfig(width=48, height=48, backend="bvh")
    img1 = np.asarray(render(cam, arrays, base))
    img2 = np.asarray(render(cam, arrays, dataclasses.replace(base, ssaa=2)))
    assert img1.shape == img2.shape == (48, 48, 3)

    sky = np.array(SKY_COLOR, np.uint8)
    is_sky1 = (img1 == sky).all(-1)
    is_cube1 = ~is_sky1
    # ssaa=1 produces only pure sky or pure cube pixels; ssaa=2 must
    # produce blended silhouette pixels (neither pure sky nor any
    # ssaa=1 cube value)
    vals1 = set(map(tuple, img1[is_cube1].reshape(-1, 3)))
    blended = [
        tuple(px) for px in img2.reshape(-1, 3)
        if tuple(px) != tuple(sky) and tuple(px) not in vals1
    ]
    assert blended, "ssaa=2 produced no antialiased silhouette pixels"

    # deep-interior pixels (all 8 neighbours also cube) should agree
    # within rounding of the 4-subsample average
    interior = is_cube1.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            interior &= np.roll(np.roll(is_cube1, dy, 0), dx, 1)
    interior[0, :] = interior[-1, :] = False
    interior[:, 0] = interior[:, -1] = False
    assert interior.any()
    d = img1[interior].astype(int) - img2[interior].astype(int)
    assert np.abs(d).max() <= 24, np.abs(d).max()


def test_ssaa_matches_manual_downsample():
    arrays, cam = _cube(32)
    hi = RenderConfig(width=64, height=64, backend="bvh")
    # manual: render 64x64 with the FOV-preserving scaled intrinsics,
    # then box-average — must equal the ssaa=2 path exactly
    p = cam.ray_params()
    from tpu_raytracer.render.pipeline import render_image

    K_inv_s = p["K_inv"] * np.array([0.5, 0.5, 1.0], np.float32)
    big = np.asarray(render_image(
        hi, arrays, K_inv_s, p["D"], p["pose"], p["inv_pose"]
    ))
    want = np.round(
        big.astype(np.float64).reshape(32, 2, 32, 2, 3).mean((1, 3))
    ).astype(np.uint8)

    lo = RenderConfig(width=32, height=32, backend="bvh", ssaa=2)
    got = np.asarray(render_image(
        lo, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]
    ))
    # f32-vs-f64 mean rounding can differ at exact .5 boundaries
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).all()
