"""The adaptive Radau flux core vs the analytic gray OLR, the discretized
core, and the scipy adaptive oracle.

Covers the reference's second engine (core=Radau, ref shared.jl:40-51,
core/radau.jl) now implemented on-device (rt/radau.py + utils/radau.py).
"""

import numpy as np
import pytest
from scipy.integrate import quad

from clearsky_tpu import DirectGas, Radau, RadauEq
from clearsky_tpu.absorption.absorbers import AcceleratedAbsorber
from clearsky_tpu.absorption.gas import GrayGas
from clearsky_tpu.rt.fluxes import monochromatic_fluxes, optical_depth, outgoing
from clearsky_tpu.rt import ode_ref
from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.utils.grids import logrange, trapz
from clearsky_tpu.constants import R_GAS, SIGMA_SB, N_AVOGADRO

G, MU, CP, PS, TS = 10.0, 0.01, 1e3, 1e5, 300.0


def _analytic_olr(sigma):
    from conftest import gray_analytic_olr

    return gray_analytic_olr(sigma, G, MU, CP, PS, TS)


@pytest.mark.parametrize("sigma", [1e-28, 1e-26, 1e-24])
def test_radau_gray_olr_vs_analytic(sigma):
    """The adaptive core must pass the same <1% analytic gray bar as the
    discretized core (BASELINE config 1, ref test_gray.jl:59-72)."""
    nu = np.concatenate([logrange(1e-6, 1e5, 3000, 4), [1e6]])
    fT = lambda P: TS * (P / PS) ** (R_GAS / (MU * CP))
    fmu = lambda T, P: MU
    gas = GrayGas.create(sigma, nu)
    olr_nu = outgoing(
        PS, G, fT, fmu, gas, Ptop=1e-6, nlevels=128, vertical=True,
        core=Radau(tol=1e-6),
    )
    olr = float(trapz(nu, olr_nu))
    ref = _analytic_olr(sigma)
    assert abs(olr - ref) / ref < 0.01


def test_radau_depth_matches_lobatto():
    """Adaptive vs Lobatto-quadrature slant optical depth on a gray column."""
    nu = np.linspace(1.0, 100.0, 16)
    gas = GrayGas.create(3e-26, nu)
    fT = lambda P: 250.0 + 20.0 * np.log(P / 1e4)
    fmu = lambda T, P: MU
    theta = 0.4
    t_ad = np.asarray(
        optical_depth((1e5, 10.0), G, fT, fmu, theta, gas, core=Radau(tol=1e-8))
    )
    t_lo = np.asarray(optical_depth((1e5, 10.0), G, fT, fmu, theta, gas))
    np.testing.assert_allclose(t_ad, t_lo, rtol=1e-5)


@pytest.fixture(scope="module")
def co2_column(fixtures_dir):
    lines = SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=60)
    nu_l = np.asarray(lines.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, 96)
    gas = DirectGas.from_lines(lines, 0.95, nu)
    P = np.exp(np.linspace(np.log(10.0), np.log(1e5), 12))
    # linear-in-lnP temperature: the Radau cache's T interpolation is exact,
    # isolating the integration-engine comparison from profile representation
    fT = lambda P_: 190.0 + 12.0 * np.log(np.asarray(P_) / 10.0)
    fmu = lambda T, P_: 0.044
    return gas, nu, P, fT, fmu


def test_radau_monoflux_vs_oracle(co2_column):
    """Adaptive on-device fluxes vs the scipy adaptive oracle on the same
    cached opacity column (both engines interpolate log sigma in lnP)."""
    gas, nu, P, fT, fmu = co2_column
    import jax.numpy as jnp

    A = AcceleratedAbsorber.create(jnp.asarray(fT(P)), jnp.asarray(P), gas)
    S_nu = np.zeros_like(nu)
    M_up, M_down, tau = monochromatic_fluxes(
        P, G, fT, fmu, 0.0, 0.0, A, core=Radau(tol=1e-7)
    )
    Mu_ref, Md_ref = ode_ref.ode_monoflux(
        P, G, fT, fmu, A, S_nu=S_nu, albedo_nu=0.0,
        rtol=1e-9, atol=1e-12, sigma_of_P=ode_ref._np_sigma_accel(A),
    )
    scale = np.abs(Mu_ref).max()
    np.testing.assert_allclose(np.asarray(M_up), Mu_ref, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(M_down), Md_ref, atol=2e-5 * scale)
    assert tau.shape == (len(P) - 1, len(nu))
    assert np.all(np.asarray(tau) >= 0)


def test_radau_vs_refined_discretized(co2_column):
    """The two engines must agree on a line-by-line column once the
    discretized grid is refined (the resolution-for-adaptivity swap,
    SURVEY.md §7.2)."""
    gas, nu, P, fT, fmu = co2_column
    M_up_a, M_down_a, _ = monochromatic_fluxes(
        P, G, fT, fmu, 10.0, 0.3, gas, core=Radau(tol=1e-7)
    )
    M_up_d, M_down_d, _ = monochromatic_fluxes(
        P, G, fT, fmu, 10.0, 0.3, gas, core=RadauEq(refine=16, nlobatto=4)
    )
    scale = float(np.abs(np.asarray(M_up_d)).max())
    np.testing.assert_allclose(
        np.asarray(M_up_a), np.asarray(M_up_d), atol=3e-3 * scale
    )
    np.testing.assert_allclose(
        np.asarray(M_down_a), np.asarray(M_down_d), atol=3e-3 * scale
    )


def test_radau_surface_and_toa_conventions(co2_column):
    """M_down at TOA must be exactly the direct beam; M_up at the surface
    pi*(reflection + Planck) — the discretized core's conventions
    (ref radau.jl:240-266, discretized.jl:299-322)."""
    gas, nu, P, fT, fmu = co2_column
    M_up, M_down, _ = monochromatic_fluxes(
        P, G, fT, fmu, 5.0, 0.25, gas, core=Radau(tol=1e-6)
    )
    c = np.cos(0.841)
    np.testing.assert_allclose(np.asarray(M_down)[0], c * 5.0, rtol=1e-6)
    from clearsky_tpu.ops.planck import planck

    B_s = np.asarray(planck(np.asarray(nu), fT(P[-1])))
    expect = np.pi * (np.asarray(M_down)[-1] * 0.25 / np.pi + B_s)
    np.testing.assert_allclose(np.asarray(M_up)[-1], expect, rtol=1e-6)


def test_rcm_heating_with_radau_core(co2_column, fixtures_dir):
    """RCM accepts core=Radau (the reference's RCM works with either engine,
    ref radiative_convective.jl:42-103): heating agrees with the discretized
    core and traces under jit (the run-loop requirement)."""
    import jax
    import jax.numpy as jnp
    from clearsky_tpu import RCM
    from clearsky_tpu.models import rcm as rcm_mod

    gas, nu, P, fT, fmu = co2_column
    Pe = np.exp(np.linspace(np.log(10.0), np.log(1e5), 10))
    Te = np.asarray(fT(Pe))
    fcp = lambda T, P_: 850.0
    r_d = RCM.create(Pe, Te, G, fmu, 0.0, 0.0, fcp, 1e7, gas)
    r_a = RCM.create(Pe, Te, G, fmu, 0.0, 0.0, fcp, 1e7, gas,
                     core=Radau(tol=1e-7))
    H_d = np.asarray(rcm_mod.heating(r_d))
    H_a = np.asarray(rcm_mod.heating(r_a))
    scale = np.abs(H_d).max()
    np.testing.assert_allclose(H_a, H_d, atol=0.03 * scale)
    # trace-safety: the adaptive core must jit (heating runs inside run loops)
    H_j = np.asarray(jax.jit(lambda T: rcm_mod.heating(r_a, T))(r_a.T))
    np.testing.assert_allclose(H_j, H_a, rtol=1e-6, atol=1e-12 * scale)
