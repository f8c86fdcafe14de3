#!/usr/bin/env python
"""Multi-config benchmark across the BASELINE.md staged scenes.

(bench.py remains the driver's single-line flagship benchmark; this
script reports one JSON line per config for the record.)
"""

import json
import time

import jax
import numpy as np


def timed(fn, frames=8):
    out = fn()
    jax.block_until_ready(out)  # compile + warm
    start = time.perf_counter()
    for _ in range(frames):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / frames


def main():
    from tpu_raytracer.app import scenes
    from tpu_raytracer.render import (
        RenderConfig,
        render_image,
        render_image_path_traced,
        render_image_whitted,
    )

    backend = "pallas" if jax.default_backend() == "tpu" else "bvh"
    key = jax.random.PRNGKey(0)
    results = []

    def report(name, cam, dt, casts=1.0):
        rays = cam.width * cam.height
        line = {
            "config": name,
            "resolution": f"{cam.width}x{cam.height}",
            "frame_ms": round(dt * 1000, 2),
            "fps": round(1 / dt, 2),
            "mrays_per_s": round(rays * casts / dt / 1e6, 2),
        }
        results.append(line)
        print(json.dumps(line), flush=True)

    # 1: cube primary
    arrays, cam = scenes.scene_cube(256)
    cfg = RenderConfig(cam.width, cam.height, backend=backend)
    p = cam.ray_params()
    args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    report("1 cube 256^2 flat", cam, timed(lambda: render_image(*args)))

    # 2: cornell + shadows
    arrays, cam = scenes.scene_cornell(512)
    cfg = RenderConfig(cam.width, cam.height, backend=backend,
                       lighting="lambert_shadow")
    p = cam.ray_params()
    args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    report("2 cornell 512^2 shadows", cam,
           timed(lambda: render_image(*args)), casts=2.0)

    # 3: bunny 1080p primary (the flagship; bench.py's number)
    arrays, cam = scenes.scene_bunny()
    cfg = RenderConfig(cam.width, cam.height, backend=backend)
    p = cam.ray_params()
    args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    report("3 bunny 82k-tri 1080p", cam, timed(lambda: render_image(*args)))

    # 4: instances + whitted reflections
    arrays, cam = scenes.scene_instances(512, 512)
    cfg = RenderConfig(cam.width, cam.height, backend=backend)
    p = cam.ray_params()
    args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    report("4 instances whitted x2", cam,
           timed(lambda: render_image_whitted(*args)), casts=5.0)

    # 4b: the same scene with static instances flattened into one
    # world-space mesh (Scene.flattened) — one traversal per cast
    arrays, cam = scenes.scene_instances(512, 512, flatten=True)
    cfg = RenderConfig(cam.width, cam.height, backend=backend)
    p = cam.ray_params()
    args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    report("4b instances whitted x2 (flattened)", cam,
           timed(lambda: render_image_whitted(*args)), casts=5.0)

    # 5: colonnade, 256k tris on the fast kernel (scene tables ~20MB of
    # VMEM; the pallas_call raises the compiler's 16MB default limit)
    arrays, cam = scenes.scene_colonnade(512, 512)
    cfg = RenderConfig(cam.width, cam.height, backend=backend)
    p = cam.ray_params()
    args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
    try:
        # frames=8: with only 2 pipelined frames the ~25ms tunnel
        # round-trip dominated the 2ms compute (read 49 fps vs 120)
        report("5a colonnade 256k-tri primary", cam,
               timed(lambda: render_image(*args)))
    except Exception as e:
        print(json.dumps({"config": "5a colonnade", "error": str(e)[:160]}),
              flush=True)

    # 5b: the full BASELINE config 5 — multi-bounce path tracing with an
    # animated camera fly-through (poses are per-frame runtime args, so
    # the fly-through never recompiles). SAMPLES x (BOUNCES+1) casts of
    # the full pixel grid per frame.
    from tpu_raytracer.app.controls import fly_through

    SAMPLES, BOUNCES = 2, 2
    casts = SAMPLES * (BOUNCES + 1)
    try:
        def pt_frame(pose_arr, inv_pose_arr, k):
            return render_image_path_traced(
                cfg, arrays, p["K_inv"], p["D"], pose_arr, inv_pose_arr,
                jax.random.PRNGKey(k), BOUNCES, SAMPLES,
            )

        from tpu_raytracer.core import transforms as T

        poses = list(fly_through(np.asarray(p["pose"]), frames=5,
                                 forward_per_frame=0.15))
        inv_poses = [np.asarray(T.invert_lre(q)) for q in poses]
        out = pt_frame(poses[0], inv_poses[0], 0)
        jax.block_until_ready(out)  # compile + warm
        start = time.perf_counter()
        for k, (q, iq) in enumerate(zip(poses, inv_poses)):
            out = pt_frame(q, iq, k)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - start) / len(poses)
        report("5b colonnade path-traced fly-through "
               f"({SAMPLES}spp x {BOUNCES+1} casts)", cam, dt, casts=casts)
    except Exception as e:
        print(json.dumps({"config": "5b colonnade path", "error": str(e)[:160]}),
              flush=True)


if __name__ == "__main__":
    main()
