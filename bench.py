#!/usr/bin/env python
"""Benchmark driver: primary-ray throughput on the flagship config.

BASELINE config 3: bunny-class mesh (~82k triangles, full BVH) at
1920x1080 — the reference's own instrumented metric is wall-clock FPS
over full-frame kernel launches (kernel.cu:275-293); ours is Mrays/s
over jitted full-frame renders on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is against the driver's 200 Mrays/s north star
(BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def build_bench_scene():
    import os

    from tpu_raytracer.render import Camera
    from tpu_raytracer.scene import Material, MeshInstance, MeshPrimitive, Scene, procgen

    scene = Scene()
    scene.add_material(Material(albedo=(0.8, 0.3, 0.2)))
    v0, v1, v2 = procgen.blob(subdivisions=6)  # 81 920 tris, bunny-class
    min_leaf = int(os.environ.get("TRT_MIN_LEAF", "16"))
    scene.add_mesh(MeshPrimitive.from_triangles(v0, v1, v2, min_leaf_size=min_leaf))
    inst = MeshInstance(0, 0)
    scene.add_mesh_instance(inst)
    cam = Camera.looking(1920, 1088, fov_deg=50.0, pose=[0.0, -3.2, 0.13, 0, 0, 0])
    return scene.compile(), cam


def main():
    import jax

    from tpu_raytracer.render import RenderConfig, render_image
    from tpu_raytracer.utils import enable_compilation_cache

    enable_compilation_cache()  # repeat runs skip the minutes-long
    # pallas compile (utils/compile_cache.py; TRT_COMPILE_CACHE=0 opts out)

    target_mrays = 200.0  # BASELINE.md north star
    arrays, cam = build_bench_scene()
    p = cam.ray_params()

    backend = "pallas" if jax.default_backend() == "tpu" else "bvh"
    if len(sys.argv) > 1:
        backend = sys.argv[1]
    config = RenderConfig(width=cam.width, height=cam.height, backend=backend)

    def frame():
        return render_image(config, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])

    img = np.asarray(frame())  # compile + warm
    rays = cam.width * cam.height

    # best-of pipelined reps: single-rep readings vary ~+-5% with
    # tunnel/host noise; best-of is the honest steady-state throughput.
    # The axon tunnel has a multi-second cold phase after idle periods
    # (a fresh process can read ~2.5x slow for its first minute even
    # after compile warmup) and multi-minute slow "weather" phases —
    # run reps until the best-of stops improving (patience 3, minimum
    # 4, bounded at 20) so a cold snapshot converges to the same
    # steady state a warm one reads.
    n_iters = 10
    elapsed = float("inf")
    reps_since_improved = 0
    for rep in range(20):
        start = time.perf_counter()
        for _ in range(n_iters):
            out = frame()
        jax.block_until_ready(out)
        dt = time.perf_counter() - start
        if dt < elapsed * 0.98:
            elapsed = min(elapsed, dt)
            reps_since_improved = 0
        else:
            elapsed = min(elapsed, dt)
            reps_since_improved += 1
        if rep >= 3 and reps_since_improved >= 3:
            break

    mrays = rays * n_iters / elapsed / 1e6
    hit_frac = float((img != np.array([255, 204, 153], np.uint8)).any(-1).mean())
    result = {
        "metric": f"primary-ray throughput, 82k-tri BVH scene @1920x1088 ({backend})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / target_mrays, 4),
        "fps": round(rays * n_iters / elapsed / rays, 2),
        "hit_fraction": round(hit_frac, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
