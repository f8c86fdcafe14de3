"""Alternate packet-geometry kernel families (kernels/family.py).

Bounce casts can route to a narrow-packet kernel family while
primaries keep the process default (integrators._bounce_packet).
Packet membership changes visit ORDER, so accepted hit DISTANCES are
bit-identical across geometries but triangle — and on multi-instance
scenes INSTANCE — ids may flip on EXACT t-ties (coplanar surfaces;
the strict-< accept resolves ties by visit order). Tie policy:
kernels/tlas.py module docstring. The oracle here re-intersects BOTH
picks at every differing pixel and requires them to be valid hits at
the same distance."""

import sys

import numpy as np

from tpu_raytracer.kernels import traversal as default_traversal
from tpu_raytracer.kernels.family import family_cast_fn, get_family


def _reintersect_t(arrays, o, d, inst, tri):
    """Brute re-intersection oracle: world-parameter t of ray (o, d)
    against triangle ``tri`` inside instance ``inst``, or +inf when the
    pick is not a valid hit (outside / backfacing / behind). Same math
    as the kernels' accept predicate (intersect.py)."""
    import jax.numpy as jnp

    from tpu_raytracer.render.intersect import (
        point_in_triangle_uv, ray_plane_hit,
    )
    from tpu_raytracer.render.renderer import _instance_object_ray

    oo, od = _instance_object_ray(arrays, inst, jnp.asarray(o),
                                  jnp.asarray(d))
    t, _, valid = ray_plane_hit(oo, od, arrays.tri_v0[tri],
                                arrays.tri_normal[tri])
    _, inside = point_in_triangle_uv(
        oo, od, t, arrays.tri_v0[tri], arrays.tri_v1[tri],
        arrays.tri_v2[tri], arrays.tri_uv0[tri], arrays.tri_uv1[tri],
        arrays.tri_uv2[tri],
    )
    backface = jnp.sum(od * arrays.tri_normal[tri]) < 0.0
    ok = valid & inside & backface
    return float(jnp.where(ok, t, jnp.inf))


def test_family_coexists_with_default():
    fam = get_family(16, 64)
    assert fam["traversal"] is not default_traversal
    assert fam["traversal"].TILE == 16 * 64
    assert default_traversal.TILE == 64 * 64
    # the default family's sys.modules entry is untouched
    assert (
        sys.modules["tpu_raytracer.kernels.traversal"] is default_traversal
    )
    # cached: second build returns the same instance
    assert get_family(16, 64)["traversal"] is fam["traversal"]


def test_family_rejects_unaligned_geometry():
    import pytest

    with pytest.raises(ValueError):
        get_family(8, 64)  # TILE_S would be 4 — sublanes must be 8-aligned


def test_family_cast_t_identical_tri_ties_only(monkeypatch):
    """Same scene, same rays: narrow-family cast accepts the same hit
    DISTANCE for every ray, bit for bit (through pallas interpret on
    CPU). Triangle AND instance ids may differ, but only on exact
    t-ties: at every differing pixel, BOTH picks must re-intersect as
    valid hits at the shared reported distance (coplanar surfaces —
    here the cornell mirror quad lying in a wall's plane)."""
    sys.path.insert(0, "tests")
    from test_integrators import cornell_scene, _rays

    arrays, cam = cornell_scene(mirror=True)
    o, d = _rays(cam)
    base = default_traversal.cast_rays_pallas(arrays, o, d)
    narrow = family_cast_fn(16, 64)(arrays, o, d)
    np.testing.assert_array_equal(np.asarray(narrow.t), np.asarray(base.t))
    tri_a, tri_b = np.asarray(base.tri), np.asarray(narrow.tri)
    inst_a, inst_b = np.asarray(base.inst), np.asarray(narrow.inst)
    t_ref = np.asarray(base.t)
    differs = (tri_a != tri_b) | (inst_a != inst_b)
    # tie flips are rare (shared wall edges / coplanar overlaps): a
    # traversal bug would flip whole regions
    assert differs.mean() < 0.02
    o_full = np.broadcast_to(np.asarray(o, np.float32),
                             np.asarray(d).shape)
    d_full = np.asarray(d, np.float32)
    for py, px in zip(*np.nonzero(differs)):
        ta = _reintersect_t(arrays, o_full[py, px], d_full[py, px],
                            int(inst_a[py, px]), int(tri_a[py, px]))
        tb = _reintersect_t(arrays, o_full[py, px], d_full[py, px],
                            int(inst_b[py, px]), int(tri_b[py, px]))
        assert np.isfinite(ta) and np.isfinite(tb), (
            f"pixel ({py},{px}): flip to an invalid hit "
            f"(t_base={ta}, t_narrow={tb})"
        )
        np.testing.assert_allclose(ta, tb, rtol=1e-6, atol=0.0,
                                   err_msg=f"pixel ({py},{px}) not a tie")
        np.testing.assert_allclose(ta, t_ref[py, px], rtol=1e-6, atol=0.0)


def test_whitted_narrow_bounce_matches(monkeypatch):
    """Whitted with TRT_BOUNCE_PACKET=16x64 (reflection casts on the
    narrow family) matches the single-family render except on exact
    t-tie pixels (coplanar shared edges pick either triangle — same
    plane, same material, so at most rounding-level flips)."""
    sys.path.insert(0, "tests")
    from test_integrators import cornell_scene, _rays
    from tpu_raytracer.render.integrators import render_whitted

    arrays, cam = cornell_scene(mirror=True)
    o, d = _rays(cam)
    monkeypatch.setenv("TRT_BOUNCE_PACKET", "0")
    base = np.asarray(render_whitted(arrays, o, d, max_bounces=1,
                                     backend="pallas"))
    monkeypatch.setenv("TRT_BOUNCE_PACKET", "16x64")
    narrow = np.asarray(render_whitted(arrays, o, d, max_bounces=1,
                                       backend="pallas"))
    mismatched = (narrow != base).any(axis=-1)
    assert mismatched.mean() < 0.02, f"{mismatched.sum()} pixels differ"
