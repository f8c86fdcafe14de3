"""Thin-lens depth of field (render_path_traced lens_radius — framework
extension; the reference is a pure pinhole, raycast.cu:159-188)."""

import jax
import numpy as np

from tpu_raytracer.render import Camera, RenderConfig
from tpu_raytracer.render.pipeline import render_image_path_traced
from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen


def _two_cube_scene():
    """Emissive cubes (radiance = emit exactly, so the only blur source
    is the lens): one at the focal plane, one far behind."""
    scene = Scene()
    scene.add_material(Material(albedo=(0, 0, 0), illumination=1.0))
    scene.add_mesh(objloader.loads(procgen.cube_obj(0.8)))
    near = MeshInstance(0, 0)
    near.pose = np.array([-0.9, 0.0, 0.0, 0, 0, 0], np.float32)
    far = MeshInstance(0, 0)
    far.pose = np.array([2.5, 9.0, 0.0, 0, 0, 0], np.float32)
    scene.add_mesh_instance(near)
    scene.add_mesh_instance(far)
    cam = Camera.looking(96, 96, fov_deg=50.0, pose=[0, -4, 0, 0, 0, 0])
    return scene.compile(), cam


def _edge_blend_fraction(img, lo=158, hi=250):
    """Fraction of pixels strictly between the sky level (153 in
    channel 2) and the emissive level (255) — i.e. blurred silhouette
    blend pixels."""
    g = img[..., 2].astype(int)
    return float(((g > lo) & (g < hi)).mean())


def test_dof_blurs_offfocus_only():
    arrays, cam = _two_cube_scene()
    cfg = RenderConfig(width=96, height=96, backend="bvh",
                       light_direction=None)
    p = cam.ray_params()
    key = jax.random.PRNGKey(7)

    args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"], key)
    pin = np.asarray(render_image_path_traced(*args, 0, 4, 0.0, 4.0))
    dof = np.asarray(render_image_path_traced(*args, 0, 8, 0.25, 4.0))

    assert (pin != dof).any()
    # pinhole: silhouettes are hard (only sky/emissive levels)
    assert _edge_blend_fraction(pin) < 0.01, _edge_blend_fraction(pin)
    # lens: the far cube's silhouette must smear into blend pixels
    assert _edge_blend_fraction(dof) > 0.02, _edge_blend_fraction(dof)

    # the focal-plane cube's interior stays fully emissive
    near_region = dof[40:70, 8:30]
    assert (near_region[..., 2] > 250).mean() > 0.5
