"""Normal transform under nonuniform instance scale.

The reference pushes normals to world space by rotating then multiplying
by the instance scale (raycast.cu:115-122) — correct only for uniform
scale. SURVEY §7 step 4 ordered the fix; RenderConfig.normal_mode
selects it: "reference" (parity default) vs "inverse_transpose"
(n_w = normalize(R (n_o / s))). The oracle here is fully analytic: the
world-space face normal recomputed from the transformed triangle
vertices themselves.
"""

import numpy as np

from tpu_raytracer.core import transforms as T
from tpu_raytracer.render import Camera, RenderConfig
from tpu_raytracer.render.pipeline import render_aovs
from tpu_raytracer.scene import Material, MeshInstance, MeshPrimitive, Scene, procgen


def _squashed_sphere_scene():
    """The nonuniform-scale deformed sphere (tests/test_render.py:42)."""
    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
    v0, v1, v2 = procgen.icosphere(3)
    scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2))
    inst = MeshInstance(0, 0)
    inst.pose = np.array([0, 0, 0, 0.3, 0.2, 0.1], np.float32)
    inst.scale = np.array([1.0, 1.3, 0.8], np.float32)
    scene.add_mesh_instance(inst)
    cam = Camera.looking(48, 48, fov_deg=40.0, pose=[0.2, -3.5, 0.1, 0, 0, 0])
    return scene.compile(), cam


def _world_face_normals(arrays, tri_ids):
    """Analytic oracle: transform the hit triangles' VERTICES to world
    space (exactly as hit points are transformed: scale then
    apply_lre(inv_pose), renderer.py location chain) and take the face
    normal from the world winding."""
    inv_pose = np.asarray(arrays.inst_inv_pose)[0]
    scale = np.asarray(arrays.inst_scale)[0]

    def to_world(v):
        return np.asarray(T.apply_lre(inv_pose, (v * scale).astype(np.float32)))

    w0 = to_world(np.asarray(arrays.tri_v0)[tri_ids])
    w1 = to_world(np.asarray(arrays.tri_v1)[tri_ids])
    w2 = to_world(np.asarray(arrays.tri_v2)[tri_ids])
    n = np.cross(w1 - w0, w2 - w0)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def _aov_normals(arrays, cam, mode):
    cfg = RenderConfig(cam.width, cam.height, backend="bvh", normal_mode=mode)
    p = cam.ray_params()
    aovs = render_aovs(cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    return (
        np.asarray(aovs["normal"]),
        np.asarray(aovs["triangle"]),
        np.asarray(aovs["hit"]),
    )


def test_inverse_transpose_matches_analytic_world_normals():
    arrays, cam = _squashed_sphere_scene()
    normals, tris, hit = _aov_normals(arrays, cam, "inverse_transpose")
    assert hit.sum() > 100
    expected = _world_face_normals(arrays, np.maximum(tris, 0))
    err = np.linalg.norm(normals[hit] - expected[hit], axis=-1)
    assert err.max() < 1e-5, err.max()


def test_reference_mode_is_wrong_under_nonuniform_scale():
    """The parity default must still reproduce the reference's biased
    normals: measurably off the analytic oracle on a squashed sphere,
    but identical to it under uniform scale."""
    arrays, cam = _squashed_sphere_scene()
    normals, tris, hit = _aov_normals(arrays, cam, "reference")
    expected = _world_face_normals(arrays, np.maximum(tris, 0))
    err = np.linalg.norm(normals[hit] - expected[hit], axis=-1)
    # the 1.3/0.8 squash biases many face normals by degrees
    assert err.max() > 0.05, err.max()

    # uniform scale: both modes agree exactly with the analytic oracle
    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
    v0, v1, v2 = procgen.icosphere(2)
    scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2))
    inst = MeshInstance(0, 0)
    inst.pose = np.array([0, 0, 0, 0.3, 0.2, 0.1], np.float32)
    inst.scale = np.array([1.2, 1.2, 1.2], np.float32)
    scene.add_mesh_instance(inst)
    cam = Camera.looking(32, 32, fov_deg=40.0, pose=[0, -3.5, 0, 0, 0, 0])
    arrays_u = scene.compile()
    n_ref, tri_u, hit_u = _aov_normals(arrays_u, cam, "reference")
    n_it, _, _ = _aov_normals(arrays_u, cam, "inverse_transpose")
    assert hit_u.sum() > 50
    np.testing.assert_allclose(n_ref[hit_u], n_it[hit_u], atol=1e-6)


def test_lit_render_differs_between_modes_only_on_nonuniform():
    from tpu_raytracer.render.pipeline import render_image

    arrays, cam = _squashed_sphere_scene()
    p = cam.ray_params()
    imgs = {}
    for mode in ("reference", "inverse_transpose"):
        cfg = RenderConfig(cam.width, cam.height, backend="bvh",
                           lighting="lambert", normal_mode=mode)
        imgs[mode] = np.asarray(render_image(
            cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"]))
    assert (imgs["reference"] != imgs["inverse_transpose"]).any()
