"""Scene cache, image IO, and profiling utility tests."""

import time

import numpy as np

from tpu_raytracer.scene.cache import compile_cached, scene_fingerprint
from tpu_raytracer.utils import overlay_fps, save_png
from tpu_raytracer.utils.profiling import FrameTimer


def _scene():
    from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen

    scene = Scene()
    scene.add_material(Material(albedo=(0.5, 0.5, 0.5)))
    scene.add_mesh(objloader.loads(procgen.cube_obj()))
    scene.add_mesh_instance(MeshInstance(0, 0))
    return scene


def test_compile_cached_roundtrip(tmp_path):
    scene = _scene()
    a1 = compile_cached(scene, str(tmp_path))
    a2 = compile_cached(scene, str(tmp_path))  # from disk
    np.testing.assert_array_equal(a1.tri_v0, a2.tri_v0)
    np.testing.assert_array_equal(a1.node_child_a, a2.node_child_a)
    assert len(list(tmp_path.glob("scene_*.npz"))) == 1


def test_fingerprint_changes_with_scene(tmp_path):
    s1, s2 = _scene(), _scene()
    s2.materials[0].albedo = (0.1, 0.2, 0.3)
    assert scene_fingerprint(s1) != scene_fingerprint(s2)
    assert scene_fingerprint(s1) == scene_fingerprint(_scene())


def test_save_png_and_overlay(tmp_path):
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :, 1] = 200
    out = overlay_fps(img, 42.5)
    fp = str(tmp_path / "x.png")
    save_png(out, fp)
    import cv2

    back = cv2.imread(fp)
    assert back.shape == (32, 32, 3)
    assert (back[:, :, 1] >= 190).mean() > 0.5


def test_frame_timer():
    t = FrameTimer(rays_per_frame=1000)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert t.frames == 3
    assert 0 < t.fps < 101
    assert t.mrays_per_s > 0
    assert "3 frames" in t.summary()
