"""Browser live viewer (app/web.py): the windowed-display + mouse
surface the reference scaffolds disabled (kernel.cu:262-263, 113-139),
driven headlessly over real HTTP."""

import threading
import urllib.request

import numpy as np

from tpu_raytracer.render import Camera, RenderConfig
from tpu_raytracer.scene import (
    Material, MeshInstance, MeshPrimitive, Scene, procgen,
)


def _viewer():
    from tpu_raytracer.app.web import WebViewer

    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
    v0, v1, v2 = procgen.icosphere(1)
    scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2))
    scene.add_mesh_instance(MeshInstance(0, 0))
    cam = Camera.looking(32, 32, fov_deg=55.0, pose=[0, -3.5, 0, 0, 0, 0])
    cfg = RenderConfig(32, 32, backend="brute")
    return WebViewer(scene.compile(), cam, cfg)


def test_web_viewer_http_surface():
    viewer = _viewer()
    srv = viewer.make_server(host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(f"{base}/", timeout=30).read()
        assert b"pointermove" in page and b"/frame.png" in page

        png1 = urllib.request.urlopen(f"{base}/frame.png", timeout=120).read()
        assert png1[:8] == b"\x89PNG\r\n\x1a\n"

        # mouse drag orbits: the reference's 0.001 rad/px sensitivity
        req = urllib.request.Request(f"{base}/drag?dx=200&dy=-100",
                                     method="POST")
        assert urllib.request.urlopen(req, timeout=30).status == 200
        pose1 = viewer.pose()
        assert abs(pose1[3] - 0.2) < 1e-6  # yaw += 200 * 0.001
        assert abs(pose1[4] - 0.1) < 1e-6  # pitch -= -100 * 0.001

        # WASD flies along pose-relative axes
        req = urllib.request.Request(f"{base}/key?k=w", method="POST")
        assert urllib.request.urlopen(req, timeout=30).status == 200
        assert not np.allclose(viewer.pose()[:3], pose1[:3])

        # the moved camera renders a different frame
        png2 = urllib.request.urlopen(f"{base}/frame.png", timeout=120).read()
        assert png2 != png1
        assert viewer.frames_rendered >= 2

        import json

        stat = json.loads(urllib.request.urlopen(
            f"{base}/pose", timeout=30).read())
        assert stat["frames"] >= 2 and len(stat["pose"]) == 6
    finally:
        srv.shutdown()
        srv.server_close()


def test_web_viewer_modes():
    """--mode reaches the viewer: whitted frames differ from primary at
    the same pose; path mode accumulates progressively (spp grows while
    the camera holds still, resets when it moves)."""
    from tpu_raytracer.app.web import WebViewer

    scene = Scene()
    m = Material(albedo=(0.8, 0.3, 0.2))
    m.reflectivity = 0.5
    scene.add_material(m)
    scene.add_material(Material(albedo=(0.2, 0.6, 0.9)))
    from tpu_raytracer.scene import objloader

    v0, v1, v2 = procgen.icosphere(1)
    scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2))
    scene.add_mesh(objloader.loads(procgen.board_obj(4.0, 4.0)))
    scene.add_mesh_instance(MeshInstance(0, 0))
    floor = MeshInstance(1, 1)
    floor.pose = np.array([0.0, 0.0, -1.2, 0.0, 0.0, 0.0], np.float32)
    scene.add_mesh_instance(floor)
    arrays = scene.compile()
    cam = Camera.looking(32, 32, fov_deg=55.0, pose=[0, -3.5, 1.0, 0, 0, 0])
    cfg = RenderConfig(32, 32, backend="brute")

    prim = WebViewer(arrays, cam, cfg).render_frame()
    whit = WebViewer(arrays, cam, cfg, mode="whitted").render_frame()
    assert whit != prim  # reflections visible at the same pose

    pv = WebViewer(arrays, cam, cfg, mode="path", path_samples=1,
                   path_bounces=1)
    f1 = pv.render_frame()
    assert pv._accum_n == 1
    f2 = pv.render_frame()
    assert pv._accum_n == 2  # held still: second sample accumulated
    assert f2 != f1          # the average moved
    pv.on_drag(50, 0)
    pv.render_frame()
    assert pv._accum_n == 1  # camera moved: accumulator reset


def test_web_viewer_input_without_server():
    viewer = _viewer()
    p0 = viewer.pose()
    viewer.on_drag(100, 50)
    viewer.on_key("d")
    p1 = viewer.pose()
    assert not np.allclose(p0, p1)
    # unknown keys are ignored
    viewer.on_key("z")
    np.testing.assert_array_equal(viewer.pose(), p1)
