"""Alternate packet-geometry kernel families (kernels/family.py).

Bounce casts route to a narrow-packet kernel family while primaries
keep the process default (integrators._bounce_packet). Packet
membership changes visit order/counts, never which triangle a ray
accepts — so images must be BIT-IDENTICAL across geometries."""

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


def test_family_cast_bit_identical(monkeypatch):
    """Same scene, same rays: narrow-family cast == default cast,
    bit for bit (through pallas interpret on CPU)."""
    sys.path.insert(0, "tests")
    from test_integrators import cornell_scene, _rays

    arrays, cam = cornell_scene(mirror=True)
    o, d = _rays(cam)
    base = default_traversal.cast_rays_pallas(arrays, o, d)
    narrow = family_cast_fn(16, 64)(arrays, o, d)
    np.testing.assert_array_equal(np.asarray(narrow.t), np.asarray(base.t))
    np.testing.assert_array_equal(np.asarray(narrow.tri), np.asarray(base.tri))
    np.testing.assert_array_equal(np.asarray(narrow.inst),
                                  np.asarray(base.inst))


def test_whitted_narrow_bounce_bit_identical(monkeypatch):
    """Whitted with TRT_BOUNCE_PACKET=16x64 (reflection casts on the
    narrow family) bit-matches the single-family render."""
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
    np.testing.assert_array_equal(narrow, base)
