"""Color/shading utilities, incl. the functions the reference only
declared (math_util.h:258, :268)."""

import jax.numpy as jnp
import numpy as np

from blackhole_tpu.render import shading


def test_doppler_shift_wavelength():
    # Receding at 0.5c: lambda' = lambda * sqrt(1.5/0.5) = lambda*sqrt(3)
    out = shading.doppler_shift_wavelength(500.0, 0.5)
    np.testing.assert_allclose(float(out), 500.0 * np.sqrt(3.0), rtol=1e-5)
    # Approaching: blueshift.
    out = shading.doppler_shift_wavelength(500.0, -0.5)
    np.testing.assert_allclose(
        float(out), 500.0 / np.sqrt(3.0), rtol=1e-5
    )
    # Zero velocity: unchanged.
    np.testing.assert_allclose(
        float(shading.doppler_shift_wavelength(500.0, 0.0)), 500.0
    )


def test_apply_redshift_to_rgb_dims_and_reddens():
    hot = shading.temperature_to_rgb(jnp.float32(20000.0))
    shifted = shading.apply_redshift_to_rgb(hot, 0.5)
    # Redshift dims the total intensity.
    assert float(shifted.sum()) < float(hot.sum())
    # And increases the red fraction of the total (cooler palette entry).
    rfrac0 = float(hot[..., 0] / hot.sum())
    rfrac1 = float(shifted[..., 0] / jnp.maximum(shifted.sum(), 1e-9))
    assert rfrac1 >= rfrac0
    # z = 0 keeps values in range and finite.
    same = shading.apply_redshift_to_rgb(hot, 0.0)
    assert np.all(np.isfinite(np.asarray(same)))
    assert float(same.max()) <= 1.0


def test_temperature_to_rgb_monotonic_blue():
    temps = jnp.array([2000.0, 10000.0, 30000.0])
    rgb = shading.temperature_to_rgb(temps)
    b = np.asarray(rgb[:, 2])
    assert b[0] <= b[1] <= b[2]
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
