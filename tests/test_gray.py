"""Gray-gas analytic OLR validation (BASELINE config 1).

The reference's physics integration test (ClearSky.jl ``test/test_gray.jl`` —
disabled upstream due to a typo, treated as the spec): a gray absorber on a
dry adiabat must reproduce the closed-form gray-atmosphere OLR
("Principles of Planetary Climate" eq. 4.32) to <1% relative error across
whole-atmosphere optical depths from ~1e-4 to ~1e2.
"""

import numpy as np
import pytest
from scipy.integrate import quad

from clearsky_tpu.absorption.gas import GrayGas, SemiGrayGas
from clearsky_tpu.rt.fluxes import outgoing
from clearsky_tpu.utils.grids import logrange, trapz
from clearsky_tpu.constants import R_GAS, SIGMA_SB, N_AVOGADRO

G, MU, CP, PS, TS = 10.0, 0.01, 1e3, 1e5, 300.0


def dtau_dP(sigma):
    return 1e-4 * sigma * N_AVOGADRO / (MU * G)


def analytic_olr(sigma):
    """Pierrehumbert eq. 4.32 (ref test_gray.jl:15-24); shared helper."""
    from conftest import gray_analytic_olr

    return gray_analytic_olr(sigma, G, MU, CP, PS, TS)


@pytest.mark.parametrize("sigma", 10 ** np.linspace(-29, -23, 10))
def test_gray_olr_vs_analytic(sigma):
    nu = np.concatenate([logrange(1e-6, 1e5, 10000, 4), [1e6]])
    fT = lambda P: TS * (P / PS) ** (R_GAS / (MU * CP))
    fmu = lambda T, P: MU
    gas = GrayGas.create(sigma, nu)
    olr_nu = outgoing(
        PS, G, fT, fmu, gas, Ptop=1e-6, nlobatto=3, nlevels=256, vertical=True
    )
    olr = float(trapz(nu, olr_nu))
    ref = analytic_olr(sigma)
    assert abs(olr - ref) / ref < 0.01


def test_semigray_cuts_spectrum():
    nu = np.linspace(1.0, 2000.0, 512)
    sg = SemiGrayGas.create(1e-25, nu, nucut=1000.0)
    sig = np.asarray(sg.raw_sigma(250.0, 1e4))
    assert np.all(sig[nu <= 1000.0] == 1e-25)
    assert np.all(sig[nu > 1000.0] == 0.0)


def test_gray_hemispheric_olr_bracket():
    # hemispheric 5-stream OLR should be below the vertical-beam value for an
    # absorbing atmosphere (slant paths are optically thicker)
    nu = np.concatenate([logrange(1e-6, 1e5, 3000, 4), [1e6]])
    fT = lambda P: TS * (P / PS) ** (R_GAS / (MU * CP))
    fmu = lambda T, P: MU
    gas = GrayGas.create(1e-26, nu)
    hemi = float(trapz(nu, outgoing(PS, G, fT, fmu, gas, Ptop=1e-6, nlevels=128)))
    vert = float(
        trapz(nu, outgoing(PS, G, fT, fmu, gas, Ptop=1e-6, nlevels=128, vertical=True))
    )
    assert hemi < vert
    assert hemi > 0.5 * vert


def test_top_bottom_fluxes_api():
    from clearsky_tpu.rt.fluxes import top_fluxes, top_imbalance, bottom_fluxes

    nu = np.linspace(1.0, 3000.0, 256)
    fT = lambda P: TS * (P / PS) ** (R_GAS / (MU * CP))
    gas = GrayGas.create(1e-27, nu)
    P = np.geomspace(10.0, PS, 24)
    S0 = 340.0
    fS = lambda v: np.full(np.shape(v), S0 / 3000.0)
    up, dn = top_fluxes(P, G, fT, lambda T, P_: MU, fS, 0.3, gas)
    imb = top_imbalance(P, G, fT, lambda T, P_: MU, fS, 0.3, gas)
    bup, bdn = bottom_fluxes(P, G, fT, lambda T, P_: MU, fS, 0.3, gas)
    assert float(imb) == pytest.approx(float(up - dn), rel=1e-12)
    assert float(dn) == pytest.approx(S0 * (2999.0 / 3000.0) * np.cos(0.841), rel=1e-6)  # incoming beam
    assert float(bdn) > 0 and float(bup) > 0
    # reflected stellar light makes TOA outgoing exceed the no-albedo case
    up0, _ = top_fluxes(P, G, fT, lambda T, P_: MU, fS, 0.0, gas)
    assert float(up) > float(up0)


def test_vector_mu_profiles_through_flux_api():
    """Vector T AND mu inputs must work through every flux entry point:
    formprofile wraps vectors in a pressure interpolator called as fmu(T, P)
    — regression for the wrapper only accepting one argument (TypeError)."""
    from clearsky_tpu.rt.fluxes import fluxes, optical_depth

    nu = np.linspace(1.0, 3000.0, 128)
    gas = GrayGas.create(1e-26, nu)
    P = np.geomspace(10.0, PS, 12)
    T = np.maximum(TS * (P / PS) ** (R_GAS / (MU * CP)), 150.0)
    mu = np.full_like(P, MU)
    F_up, F_down = fluxes(P, G, T, mu, 0.0, 0.0, gas)
    assert np.all(np.isfinite(np.asarray(F_up)))
    tau = optical_depth(P, G, T, mu, 0.3, gas)
    assert np.all(np.isfinite(np.asarray(tau)))


def test_outgoing_honors_core_selectors():
    """outgoing() must honor Discretized/RadauEq core selectors (or reject
    unknown ones) instead of silently running function defaults."""
    from clearsky_tpu.rt.fluxes import Discretized, RadauEq

    nu = np.linspace(1.0, 3000.0, 128)
    gas = GrayGas.create(1e-25, nu)
    fT = lambda P: np.maximum(TS * (P / PS) ** (R_GAS / (MU * CP)), 150.0)
    base = trapz(nu, outgoing(PS, G, fT, MU, gas))
    d = trapz(nu, outgoing(PS, G, fT, MU, gas, core=Discretized(nstream=5, nlobatto=3)))
    r = trapz(nu, outgoing(PS, G, fT, MU, gas, core=RadauEq(nstream=5, refine=2)))
    np.testing.assert_allclose(float(d), float(base), rtol=1e-6)
    np.testing.assert_allclose(float(r), float(base), rtol=1e-2)
    with pytest.raises(ValueError):
        outgoing(PS, G, fT, MU, gas, core="adaptive")


def test_optical_depth_scalar_ptop():
    """Scalar-P optical_depth integrates to Ptop (documented, configurable)."""
    from clearsky_tpu.rt.fluxes import optical_depth

    nu = np.linspace(1.0, 3000.0, 64)
    gas = GrayGas.create(1e-26, nu)
    fT = lambda P: np.maximum(TS * (P / PS) ** (R_GAS / (MU * CP)), 150.0)
    t1 = np.asarray(optical_depth(PS, G, fT, MU, 0.0, gas))
    t2 = np.asarray(optical_depth(PS, G, fT, MU, 0.0, gas, Ptop=1e3))
    assert np.all(t2 < t1)  # shallower column, strictly less absorber


def test_tips_clamp_out_of_range():
    """Out-of-domain temperatures hold Q at the TIPS domain edge instead of
    extrapolating the Chebyshev fit (which diverges and can go negative)."""
    import jax.numpy as jnp
    from clearsky_tpu.ops.lineshape import cheb_qref_q
    from clearsky_tpu.constants import TIPS_TMAX
    from clearsky_tpu.spectra.molparam import molparam

    co2 = molparam(2)
    coeffs = jnp.asarray(co2.cheb)
    q_edge = np.asarray(cheb_qref_q(jnp.asarray(TIPS_TMAX), coeffs))
    q_out = np.asarray(cheb_qref_q(jnp.asarray(5000.0), coeffs))
    np.testing.assert_array_equal(q_out, q_edge)
    assert np.all(q_out > 0)
