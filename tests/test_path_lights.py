"""Path-tracer next-event estimation + specular lobe (framework
realization of the reference's disabled light-cast sketch and unused
PBR material fields: raycast.cu:263-287, Material.hpp:8-10)."""

import jax
import numpy as np

from tpu_raytracer.render.integrators import PointLight, render_path_traced
from tpu_raytracer.render.pipeline import RenderConfig, render_image_path_traced
from tpu_raytracer.render import Camera
from tpu_raytracer.scene import Material, MeshInstance, Scene, objloader, procgen

SKY = np.array([1.0, 0.8, 0.6], np.float32)  # SKY_F32


def _cube_scene(mat, extra=None):
    scene = Scene()
    scene.add_material(mat)
    scene.add_mesh(objloader.loads(procgen.cube_obj(0.8)))
    scene.add_mesh_instance(MeshInstance(0, 0))
    if extra is not None:
        inst = MeshInstance(0, 0)
        inst.pose = np.asarray(extra, np.float32)
        inst.scale = np.array([0.3, 0.3, 0.3], np.float32)
        scene.add_mesh_instance(inst)
    cam = Camera.looking(96, 96, fov_deg=50.0, pose=[0, -4, 0, 0, 0, 0])
    return scene.compile(), cam


def _rays(cam):
    from tpu_raytracer.render.camera import generate_rays

    p = cam.ray_params()
    return generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])


def test_nee_analytic_lambertian():
    """Sun NEE on an unoccluded Lambertian face is DETERMINISTIC:
    radiance = albedo * cos_i / pi exactly (zero variance — the direct
    term needs no luck), with a black sky and the light along the face
    normal."""
    albedo = 0.6
    arrays, cam = _cube_scene(Material(albedo=(albedo,) * 3))
    o, d = _rays(cam)
    img = np.asarray(render_path_traced(
        arrays, o, d, jax.random.PRNGKey(0), max_bounces=2, samples=2,
        backend="bvh", sky_strength=0.0, light_direction=(0.0, -1.0, 0.0),
    ))
    patch = img[40:56, 40:56]  # well inside the front face
    expect = albedo / np.pi
    assert np.allclose(patch, expect, atol=2e-3), (patch.mean(), expect)
    # sky pixels stay black (sky_strength 0, nothing emissive)
    assert img[2, 2].max() < 1e-6


def test_nee_hard_shadow():
    """A small cube between the sun and the big cube's face kills the
    NEE term there; the mirror-image unshadowed spot keeps albedo/pi.

    Geometry (cube_obj(0.8) = half-size 0.4, face plane y=-0.4 seen
    from y=-4): occluder half 0.1 at (0.3, -2.5, 0) shadows face
    x in [0.2, 0.4], z in [-0.1, 0.1] (sun along -y); camera rays to
    that patch pass y=-2.5 at x ~ 0.42*x_f in [0.08, 0.17] — clear of
    the occluder, so the patch is visible but unlit. The face spans
    ~+-11.5 px; the shadow patch sits at cols ~54-59, center rows."""
    albedo = 0.6
    arrays, cam = _cube_scene(Material(albedo=(albedo,) * 3),
                              extra=[0.3, -2.5, 0.0, 0, 0, 0])
    o, d = _rays(cam)
    img = np.asarray(render_path_traced(
        arrays, o, d, jax.random.PRNGKey(0), max_bounces=1, samples=2,
        backend="bvh", sky_strength=0.0, light_direction=(0.0, -1.0, 0.0),
    ))
    a = float(img[47:50, 55:58, 0].mean())  # shadow patch (or its mirror)
    b = float(img[47:50, 39:42, 0].mean())
    lit, dark = max(a, b), min(a, b)
    assert abs(lit - albedo / np.pi) < 2e-2, (a, b)
    assert dark < 0.03, (a, b)


def test_specular_mirror_exact():
    """reflectivity=1, roughness=0: every sample takes the mirror lobe,
    so a cube against the flat sky renders albedo * sky EXACTLY."""
    albedo = np.array([0.5, 1.0, 0.25], np.float32)
    arrays, cam = _cube_scene(
        Material(albedo=tuple(albedo), reflectivity=1.0, roughness=0.0))
    o, d = _rays(cam)
    img = np.asarray(render_path_traced(
        arrays, o, d, jax.random.PRNGKey(1), max_bounces=1, samples=2,
        backend="bvh",
    ))
    patch = img[44:52, 44:52]
    assert np.allclose(patch, albedo * SKY, atol=2e-3), patch.mean(axis=(0, 1))


def test_point_light_nee_and_pipeline():
    """PointLight NEE through the jitted pipeline (path_lights=True):
    inverse-square + cos falloff brightens the face; the u8 image
    differs from the lights-off render."""
    arrays, cam = _cube_scene(Material(albedo=(0.8, 0.8, 0.8)))
    p = cam.ray_params()
    key = jax.random.PRNGKey(2)
    base = RenderConfig(width=96, height=96, backend="bvh",
                        light_direction=None, sun_intensity=1.0)
    lit_cfg = RenderConfig(
        width=96, height=96, backend="bvh", light_direction=None,
        point_lights=(PointLight(position=(0.0, -2.0, 0.0), intensity=4.0),),
        path_lights=True,
    )
    args = (arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"], key)
    off = np.asarray(render_image_path_traced(base, *args, 1, 2))
    on = np.asarray(render_image_path_traced(lit_cfg, *args, 1, 2))
    face_off = off[44:52, 44:52].astype(int)
    face_on = on[44:52, 44:52].astype(int)
    assert face_on.mean() > face_off.mean() + 10, (
        face_on.mean(), face_off.mean())
