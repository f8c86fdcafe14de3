"""Ambient occlusion (integrators.render_ao / pipeline.render_image_ao
— framework extension over the reference's unused curand scaffolding,
raycast.cu:190-193)."""

import sys

import jax
import numpy as np

sys.path.insert(0, "tests")

from tpu_raytracer.render import Camera, RenderConfig, generate_rays
from tpu_raytracer.render.integrators import render_ao
from tpu_raytracer.scene import (
    Material, MeshInstance, MeshPrimitive, Scene, procgen,
)


def _rays(cam):
    p = cam.ray_params()
    return generate_rays(
        cam.width, cam.height, p["K_inv"], p["D"], p["pose"], p["inv_pose"]
    )


def _floor_scene(with_wall=False, wall_dist=0.5):
    """A big floor quad at z=0 (normal +z), optionally a vertical wall
    crossing it (two perpendicular planes -> corner occlusion)."""
    scene = Scene()
    m = scene.add_material(Material(albedo=(0.8, 0.8, 0.8)))
    s = 20.0
    quad = np.array([
        [[-s, -s, 0], [s, -s, 0], [s, s, 0]],
        [[-s, -s, 0], [s, s, 0], [-s, s, 0]],
    ], np.float32)
    mesh = MeshPrimitive.from_triangles(quad[:, 0], quad[:, 1], quad[:, 2])
    scene.add_mesh_instance(MeshInstance(scene.add_mesh(mesh), m))
    if with_wall:
        wall = np.array([
            [[-s, wall_dist, 0], [s, wall_dist, 0], [s, wall_dist, 2 * s]],
            [[-s, wall_dist, 0], [s, wall_dist, 2 * s], [-s, wall_dist, 2 * s]],
        ], np.float32)
        wm = MeshPrimitive.from_triangles(wall[:, 0], wall[:, 1], wall[:, 2])
        scene.add_mesh_instance(MeshInstance(scene.add_mesh(wm), m))
    cam = Camera.looking(32, 32, fov_deg=60.0,
                         pose=[0.0, -2.0, 1.5, -0.6, 0, 0])
    return scene.compile(), cam


def test_open_plane_is_unoccluded():
    arrays, cam = _floor_scene(with_wall=False)
    o, d = _rays(cam)
    ao = np.asarray(render_ao(arrays, o, d, jax.random.PRNGKey(0),
                              samples=16, radius=1.0, backend="bvh"))
    assert ao.shape == (32, 32)
    assert (ao > 0.999).all()  # nothing above the floor to occlude


def test_wall_darkens_the_corner():
    arrays, cam = _floor_scene(with_wall=True, wall_dist=0.5)
    o, d = _rays(cam)
    # radius 0.4: the wall (at y=0.5) occludes floor points closer than
    # 0.4 to it, while floor at y < -0.1 (0.6+ away) stays fully open
    ao = np.asarray(render_ao(arrays, o, d, jax.random.PRNGKey(0),
                              samples=32, radius=0.4, backend="bvh"))
    # classify pixels by world hit point: floor is z ~= 0 (the rest of
    # the view is the wall itself)
    from tpu_raytracer.render.renderer import get_cast_fn, hit_attributes

    attrs = hit_attributes(
        arrays, np.broadcast_to(np.asarray(o), np.asarray(d).shape), d,
        get_cast_fn("bvh")(arrays, o, d),
    )
    loc = np.asarray(attrs.location)
    hit = np.asarray(attrs.hit)
    floor = hit & (np.abs(loc[..., 2]) < 1e-3)
    near = floor & (loc[..., 1] > 0.25)   # within 0.25 of the wall
    far = floor & (loc[..., 1] < -0.1)    # 0.6+ from the wall
    assert near.any() and far.any()
    assert ao[near].mean() < 0.8  # corner is occluded
    assert ao[far].mean() > 0.95  # open floor stays bright
    assert ao[near].mean() < ao[far].mean() - 0.1


def test_radius_bounds_the_query():
    # the wall is 1.4 units from the far floor pixels: with radius 0.2
    # nothing registers even right at the corner
    arrays, cam = _floor_scene(with_wall=True, wall_dist=0.5)
    o, d = _rays(cam)
    ao = np.asarray(render_ao(arrays, o, d, jax.random.PRNGKey(1),
                              samples=16, radius=0.05, backend="bvh"))
    assert (ao > 0.99).mean() > 0.95  # tiny radius ~= fully open


def test_pipeline_entry_grayscale_u8():
    from tpu_raytracer.render.pipeline import render_image_ao

    arrays, cam = _floor_scene(with_wall=True)
    p = cam.ray_params()
    config = RenderConfig(width=cam.width, height=cam.height, backend="bvh")
    img = np.asarray(render_image_ao(
        config, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"],
        jax.random.PRNGKey(0), 8, 1.0,
    ))
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert (img[..., 0] == img[..., 1]).all()  # grayscale
    assert img.max() > 200  # open sky/floor is bright
