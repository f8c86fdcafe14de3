"""Colonnade watertightness oracle (TPU script, like test_pallas_tpu).

Compares the pallas packet kernel against the brute-force all-triangles
backend on ~800 sampled colonnade rays, deliberately including the
degenerate axis-aligned rays (center image row/column, where direction
components are exactly 0 and origins lie exactly in box boundary
planes) that motivated the watertight slab handling. Run on the TPU:

    python tests/oracle_colonnade.py

Expected output: 0 beyond-tolerance mismatches.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from tpu_raytracer.app import scenes
    from tpu_raytracer.kernels.traversal import cast_rays_pallas
    from tpu_raytracer.render.camera import generate_rays
    from tpu_raytracer.render.renderer import cast_rays_brute

    arrays, cam = scenes.scene_colonnade(512, 512)
    p = cam.ray_params()
    o, d = generate_rays(cam.width, cam.height, p["K_inv"], p["D"],
                         p["pose"], p["inv_pose"])
    o = np.broadcast_to(np.asarray(o), np.asarray(d).shape)
    d = np.asarray(d)

    h, w = d.shape[:2]
    rng = np.random.default_rng(0)
    ys = rng.integers(0, h, 256)
    xs = rng.integers(0, w, 256)
    # the degenerate structured rays: full center row + center column
    # (axis-aligned camera -> d components exactly 0 there)
    cy, cx = h // 2, w // 2
    sel_y = np.concatenate([ys, np.full(w // 2, cy), np.arange(0, h, 2)])
    sel_x = np.concatenate([xs, np.arange(0, w, 2), np.full(h // 2, cx)])
    so = o[sel_y, sel_x]
    sd = d[sel_y, sel_x]
    n = so.shape[0]

    hit_p = cast_rays_pallas(arrays, jnp.asarray(so), jnp.asarray(sd))
    tp = np.asarray(hit_p.t)

    # brute in chunks (a [rays, 256k-tri] test matrix is HBM-hungry)
    tb = np.empty(n, np.float32)
    trib = np.empty(n, np.int32)
    step = 128
    for s in range(0, n, step):
        hb = cast_rays_brute(arrays, jnp.asarray(so[s:s+step]),
                             jnp.asarray(sd[s:s+step]))
        tb[s:s+step] = np.asarray(hb.t)
        trib[s:s+step] = np.asarray(hb.tri)

    both_miss = (tp > 1e30) & (tb > 1e30)
    rel = np.abs(tp - tb) / np.maximum(np.abs(tb), 1e-6)
    ok = both_miss | (rel < 1e-3)
    bad = np.nonzero(~ok)[0]
    print(f"{n} rays sampled; {len(bad)} beyond-tolerance mismatches")
    if len(bad):
        for i in bad[:10]:
            print(f"  ray {i}: pixel=({sel_y[i]},{sel_x[i]}) "
                  f"pallas t={tp[i]:.6g} brute t={tb[i]:.6g} tri={trib[i]}")
        sys.exit(1)
    print("colonnade oracle OK")


if __name__ == "__main__":
    main()
