"""App-layer tests: staged scenes, camera controls, demo driver."""

import numpy as np

from tpu_raytracer.app import controls, scenes
from tpu_raytracer.core import transforms as T
from tpu_raytracer.render import RenderConfig, render_image
from tpu_raytracer.render.shade import SKY_COLOR


def test_scene_cube_renders():
    arrays, cam = scenes.scene_cube(64)
    p = cam.ray_params()
    config = RenderConfig(width=64, height=64, backend="bvh")
    img = np.asarray(
        render_image(config, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    )
    hit = (img != np.asarray(SKY_COLOR, np.uint8)).any(-1)
    assert 0.02 < hit.mean() < 0.9


def test_scene_cornell_encloses_camera():
    arrays, cam = scenes.scene_cornell(32)
    p = cam.ray_params()
    config = RenderConfig(width=32, height=32, backend="bvh",
                          lighting="lambert_shadow")
    img = np.asarray(
        render_image(config, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    )
    # enclosed box: every ray hits geometry
    assert (img != np.asarray(SKY_COLOR, np.uint8)).any(-1).all()


def test_scene_instances_compiles():
    arrays, cam = scenes.scene_instances(32, 32)
    assert arrays.num_instances == 4
    assert float(np.asarray(arrays.mat_reflectivity).max()) > 0


def test_scene_colonnade_is_sponza_class():
    arrays, cam = scenes.scene_colonnade(64, 64)
    assert arrays.num_triangles > 250_000
    assert int(np.asarray(arrays.node_leaf_count).max()) < 1024


def test_orbit_matches_reference_semantics():
    pose = np.zeros(6, np.float32)
    p2 = controls.orbit(pose, dx=100, dy=50)
    np.testing.assert_allclose(p2[3], 0.1, atol=1e-6)
    np.testing.assert_allclose(p2[4], -0.05, atol=1e-6)


def test_fly_moves_along_camera_axes():
    pose = np.array([1.0, 2.0, 3.0, 0, 0, 0], np.float32)
    p2 = controls.fly(pose, forward=0.5)
    np.testing.assert_allclose(p2[0:3], [1.0, 2.5, 3.0], atol=1e-5)
    # with yaw, forward is rotated
    pose_yaw = np.array([0, 0, 0, np.pi / 2, 0, 0], np.float32)
    p3 = controls.fly(pose_yaw, forward=1.0)
    np.testing.assert_allclose(p3[0:3], [1.0, 0.0, 0.0], atol=1e-5)


def test_fly_through_generates_poses():
    poses = list(controls.fly_through(np.zeros(6, np.float32), 5))
    assert len(poses) == 5
    assert poses[-1][1] > poses[0][1] - 1e-6  # moved forward-ish
