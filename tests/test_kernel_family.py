"""Alternate packet-geometry kernel families (kernels/family.py).

Bounce casts can route to a narrow-packet kernel family while
primaries keep the process default (integrators._bounce_packet).
Packet membership changes visit ORDER, so accepted hit DISTANCES are
bit-identical across geometries but triangle ids may flip on EXACT
t-ties (coplanar shared mesh edges) — the same caveat as any tree
change (PERF_LOG: the sweep tree flipped the config-5 golden's tie
pixels)."""

import sys

import numpy as np

from tpu_raytracer.kernels import traversal as default_traversal
from tpu_raytracer.kernels.family import family_cast_fn, get_family


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
    CPU); triangle ids may differ only on exact t-ties, and every
    differing pixel must agree on the owning instance."""
    sys.path.insert(0, "tests")
    from test_integrators import cornell_scene, _rays

    arrays, cam = cornell_scene(mirror=True)
    o, d = _rays(cam)
    base = default_traversal.cast_rays_pallas(arrays, o, d)
    narrow = family_cast_fn(16, 64)(arrays, o, d)
    np.testing.assert_array_equal(np.asarray(narrow.t), np.asarray(base.t))
    tri_a, tri_b = np.asarray(base.tri), np.asarray(narrow.tri)
    differs = tri_a != tri_b
    # tie flips are rare (shared wall edges): a traversal bug would
    # flip whole regions
    assert differs.mean() < 0.02
    np.testing.assert_array_equal(np.asarray(narrow.inst),
                                  np.asarray(base.inst))


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
