"""Tone mapping (integrators.tonemap — framework extension; the
reference writes linear radiance straight to uchar3, raycast.cu:292-294)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracer.render.integrators import to_u8, tonemap


def test_none_is_identity_at_unit_exposure():
    x = jnp.array([[0.0, 0.5, 1.0, 2.0]] * 3, jnp.float32)
    assert np.array_equal(np.asarray(tonemap(x)), np.asarray(x))
    # the u8 output path stays bit-identical to the historical cast
    assert np.array_equal(np.asarray(to_u8(tonemap(x))), np.asarray(to_u8(x)))


def test_exposure_scales_linearly_in_none_mode():
    x = jnp.array([0.25, 0.5], jnp.float32)
    assert np.allclose(np.asarray(tonemap(x, "none", 2.0)), [0.5, 1.0])


@pytest.mark.parametrize("mode", ["reinhard", "aces"])
def test_curves_compress_into_display_range(mode):
    x = jnp.array([0.0, 0.1, 1.0, 4.0, 100.0], jnp.float32)
    y = np.asarray(tonemap(x, mode))
    assert (y >= 0.0).all() and (y <= 1.0 + 1e-6).all()
    assert (np.diff(y) >= -1e-6).all()  # monotone
    assert y[0] <= 0.05 and y[-1] > 0.9  # blacks stay dark, highlights roll off
    # gamma encode brightens midtones vs linear
    assert y[1] > 0.1


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        tonemap(jnp.zeros(3), "filmic-nope")
