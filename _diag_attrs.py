"""Micro-time hit_attributes' components @512^2 on TPU: the [T,18]
record gather, the [I,18] instance gather, the transform/bary math,
and the texture sampling — to target the right fix."""
import time

import jax
import jax.numpy as jnp

from tpu_raytracer.app import scenes
from tpu_raytracer.render.camera import generate_rays
from tpu_raytracer.render.renderer import get_cast_fn, hit_attributes
from tpu_raytracer.render.shade import shade_primary

arrays, cam = scenes.scene_instances(512, 512)
p = cam.ray_params()
cast = get_cast_fn("pallas")

@jax.jit
def base(pose, inv_pose):
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         pose, inv_pose, exact=True)
    return cast(arrays, o, d)

hit = jax.block_until_ready(base(p["pose"], p["inv_pose"]))
T = arrays.tri_v0.shape[0]
print("tris:", T, "insts:", arrays.inst_mesh.shape[0])

tri = jnp.maximum(hit.tri, 0)
inst = jnp.maximum(hit.inst, 0)
packed18 = jnp.concatenate(
    [arrays.tri_v0, arrays.tri_v1, arrays.tri_v2, arrays.tri_normal,
     arrays.tri_uv0, arrays.tri_uv1, arrays.tri_uv2], axis=1)
ipack = jnp.concatenate(
    [arrays.inst_pose, arrays.inst_inv_pose, arrays.inst_scale,
     arrays.inst_inv_scale], axis=1)

@jax.jit
def g18(tri):
    return packed18[tri]

@jax.jit
def g3(tri):
    return arrays.tri_normal[tri]

@jax.jit
def gi(inst):
    return ipack[inst]

@jax.jit
def full_attrs(pose, inv_pose):
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         pose, inv_pose, exact=True)
    h = cast(arrays, o, d)
    a = hit_attributes(arrays, o, d, h, exact=True)
    # force everything live with a cheap reduction (avoids DCE and the
    # [H,W,3] output relayout distortion)
    return (a.uv.sum() + a.normal.sum() + a.location.sum()
            + a.material.sum() + a.t.sum())

@jax.jit
def attrs_uv_only(pose, inv_pose):
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         pose, inv_pose, exact=True)
    h = cast(arrays, o, d)
    a = hit_attributes(arrays, o, d, h, exact=True)
    return a.uv.sum() + a.material.sum()

def timeit(name, fn, *args, frames=16):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / frames)
    print(f"{name}: {best*1000:.3f} ms")
    return best

b = timeit("cast only (hit out)   ", base, p["pose"], p["inv_pose"])
timeit("[T,18] record gather  ", g18, tri)
timeit("[T,3] normal gather   ", g3, tri)
timeit("[I,18] instance gather", gi, inst)
fa = timeit("cast+attrs ALL (sum)  ", full_attrs, p["pose"], p["inv_pose"])
fu = timeit("cast+attrs uv-only    ", attrs_uv_only, p["pose"], p["inv_pose"])
print(f"attrs-all in-frame: {(fa-b)*1000:.3f} ms; uv-only: {(fu-b)*1000:.3f} ms")
