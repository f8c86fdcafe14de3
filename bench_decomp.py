#!/usr/bin/env python
"""Phase-decomposition microbench: where do the whitted / path frames
spend their time? One JSON line per variant (pipelined multi-frame
timing like bench_all; single TPU process).

Usage: python bench_decomp.py [whitted|path]
"""

import json
import os
import sys
import time

if "path" in sys.argv[1:2]:
    os.environ.setdefault("TRT_PIX_H", "32")
    os.environ.setdefault("TRT_BVH_OPT", "2")

import jax
import numpy as np


def timed(fn, frames=12):
    out = fn()
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(frames):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / frames


def report(name, dt):
    print(json.dumps({"variant": name, "frame_ms": round(dt * 1000, 2),
                      "fps": round(1 / dt, 2)}), flush=True)


def whitted():
    from tpu_raytracer.app import scenes
    from tpu_raytracer.render import RenderConfig, render_image_whitted, render_image

    backend = "pallas" if jax.default_backend() == "tpu" else "bvh"
    for flatten, tag in ((True, "flat"), (False, "inst")):
        arrays, cam = scenes.scene_instances(512, 512, flatten=flatten)
        cfg = RenderConfig(cam.width, cam.height, backend=backend)
        p = cam.ray_params()
        args = (cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"])
        report(f"{tag} primary flat-lit (render_image)",
               timed(lambda: render_image(*args)))
        for b, s in ((0, False), (0, True), (1, False), (2, False), (2, True)):
            report(f"{tag} whitted b={b} shadows={s}",
                   timed(lambda: render_image_whitted(*args, max_bounces=b,
                                                      shadows=s)))


def path():
    from tpu_raytracer.app import scenes
    from tpu_raytracer.render import RenderConfig, render_image_path_traced

    backend = "pallas" if jax.default_backend() == "tpu" else "bvh"
    arrays, cam = scenes.scene_colonnade(512, 512)
    cfg = RenderConfig(cam.width, cam.height, backend=backend)
    p = cam.ray_params()
    key = jax.random.PRNGKey(0)

    def frame(b, s=2):
        return render_image_path_traced(
            cfg, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"],
            key, b, s)

    for b in (0, 1, 2):
        report(f"path b={b} 2spp", timed(lambda: frame(b)))
    os.environ["TRT_SORT_SECONDARY"] = "0"
    # re-jit with the sort disabled (env read inside secondary_cast_fn
    # at trace time; new config object forces a fresh jit cache entry)
    cfg2 = RenderConfig(cam.width, cam.height, backend=backend,
                        exposure=1.0 + 1e-9)
    def frame2(b, s=2):
        return render_image_path_traced(
            cfg2, arrays, p["K_inv"], p["D"], p["pose"], p["inv_pose"],
            key, b, s)
    report("path b=2 2spp nosort", timed(lambda: frame2(2)))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "whitted"
    {"whitted": whitted, "path": path}[which]()
