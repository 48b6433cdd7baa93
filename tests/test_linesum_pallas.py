"""Pallas line-sum kernel vs the jnp oracle (interpret mode on CPU).

The TPU kernel itself is exercised on hardware by bench.py; here the same
kernel runs through the Pallas interpreter and must match the portable
``sigma_from_lines`` path to float32 roundoff on every supported profile.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu.ops.linesum import build_line_window_plan, sigma_from_lines
from clearsky_tpu.ops.linesum_pallas import sigma_from_lines_pallas
from clearsky_tpu.spectra.lines import SpectralLines


@pytest.fixture(scope="module")
def co2(fixtures_dir):
    import jax

    lines = SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=600)
    # round the catalog to float32 so oracle and kernel see identical inputs:
    # near line cores (Lorentz widths ~3e-4 cm^-1 at low pressure) the f32
    # rounding of absolute wavenumbers (~1e-4 cm^-1 eps) is itself a
    # percent-level profile perturbation, which would otherwise dominate the
    # comparison; the kernel's own arithmetic error is what we want to test.
    return jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") and x.dtype.kind == "f" else x,
        lines,
    )


@pytest.mark.parametrize("shape,cut", [("voigt", 25.0), ("lorentz", 25.0), ("doppler", 25.0)])
def test_pallas_matches_jnp_oracle(co2, shape, cut):
    nu = np.linspace(610.0, 780.0, 512).astype(np.float32)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), cut, block=128)
    T = jnp.asarray([220.0, 300.0])
    P = jnp.asarray([5e2, 8e4])
    Pp = 0.5 * P
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, Pp, shape)).astype(np.float32)
    out = np.asarray(
        sigma_from_lines_pallas(plan, co2, T, P, Pp, shape, interpret=True)
    )
    m = ref != 0
    assert out.shape == ref.shape
    # atol floors out f32/f64 underflow asymmetries (subnormal vs exact zero)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=1e-30)
    assert np.all(np.abs(out[~m]) < 1e-30)


def test_pallas_phco2_sublorentzian(co2):
    nu = np.linspace(610.0, 700.0, 256).astype(np.float32)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 500.0, block=128)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, P, "phco2")).astype(np.float32)
    out = np.asarray(
        sigma_from_lines_pallas(plan, co2, T, P, P, "phco2", interpret=True)
    )
    m = ref != 0
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4)
