"""Atmosphere layer: adiabats, hydrostatics, saturation/composition utilities.

Closed-form and property validation of the L4 equivalents (ClearSky.jl
atmospherics.jl).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu.constants import R_GAS
from clearsky_tpu.atmosphere.adiabats import (
    DryAdiabat,
    MoistAdiabat,
    lapse,
    lapse_rate_dry,
    tropopause,
    pressure_of_temperature,
)
from clearsky_tpu.atmosphere.hydrostatics import (
    scale_height,
    hydrostatic,
    altitude,
    Hydrostatic,
)
from clearsky_tpu.atmosphere.saturation import (
    psat_h2o,
    tsat_co2,
    ozonelayer,
    condensible_profile,
    haircut,
    rayleigh_co2,
)

TS, PS, CP, MU, G = 290.0, 1e5, 1e3, 0.029, 9.8


def test_dry_adiabat_closed_form():
    ad = DryAdiabat.create(TS, PS, CP, MU)
    P = np.geomspace(10.0, PS, 50)
    expect = TS * (P / PS) ** (R_GAS / (MU * CP))
    np.testing.assert_allclose(np.asarray(ad(P)), expect, rtol=1e-12)


def test_dry_adiabat_stratosphere_options():
    ad_t = DryAdiabat.create(TS, PS, CP, MU, Tstrat=200.0)
    P = np.geomspace(1.0, PS, 400)
    T = np.asarray(ad_t(P))
    assert T.min() >= 200.0 - 1e-9
    assert abs(float(ad_t(PS)) - TS) < 1e-9
    Tt, Pt = tropopause(ad_t)
    assert Tt == 200.0 and 1.0 < Pt < PS
    # by-pressure variant with smoothing is continuous through the patch
    ad_p = DryAdiabat.create(TS, PS, CP, MU, Ptropo=2e3, smooth=500.0)
    Pfine = np.linspace(1500.0, 3000.0, 4000)
    Tf = np.asarray(ad_p(Pfine))
    jumps = np.abs(np.diff(Tf))
    assert jumps.max() < 0.1  # no discontinuity through the Hermite patch
    with pytest.raises(ValueError, match="one or the other"):
        DryAdiabat.create(TS, PS, CP, MU, Tstrat=200.0, Ptropo=1e3)


def test_pressure_of_temperature_inverts():
    ad = DryAdiabat.create(TS, PS, CP, MU)
    for T in [250.0, 200.0, 150.0]:
        P = pressure_of_temperature(ad, T)
        assert abs(float(ad.temperature_raw(P)) - T) < 1e-6


def test_moist_adiabat_dry_limit():
    # condensible with vanishing saturation pressure -> dry adiabat
    ad_m = MoistAdiabat.create(
        TS, PS, CP, 1.9e3, MU, 0.018, 2.5e6, lambda T: 1e-20, N=800
    )
    ad_d = DryAdiabat.create(TS, PS, CP, MU)
    P = np.geomspace(100.0, PS, 30)
    np.testing.assert_allclose(
        np.asarray(ad_m(P)), np.asarray(ad_d(P)), rtol=2e-4
    )


def test_moist_adiabat_warmer_than_dry():
    # latent heating makes the moist profile warmer aloft
    ad_m = MoistAdiabat.create(TS, PS, CP, 1.9e3, MU, 0.018, 2.5e6, psat_h2o, N=800)
    ad_d = DryAdiabat.create(TS, PS, CP, MU)
    P = np.geomspace(1e3, 0.9 * PS, 20)
    assert np.all(np.asarray(ad_m(P)) > np.asarray(ad_d(P)))


def test_lapse_leaves_stable_profile():
    # an isothermal column has zero profile lapse < adiabatic everywhere, so
    # the sweep must not touch it. (A discretized adiabat is NOT a fixed
    # point: on a coarse grid the secant lapse between nodes exceeds the
    # local analytic lapse at the lower node — same behavior as the
    # reference's lapse!.)
    P = np.geomspace(1e3, PS, 30)
    T = np.full(30, 250.0)
    out = np.asarray(lapse(jnp.asarray(T), jnp.asarray(P), CP, MU))
    np.testing.assert_allclose(out, T, rtol=1e-12)


def test_hydrostatic_isothermal_analytic():
    T0 = 250.0
    fT = lambda P: T0
    fmu = lambda T, P: MU
    H = scale_height(G, MU, T0)
    for z in [1e3, 1e4, 3e4]:
        P = hydrostatic(z, PS, G, fT, fmu)
        assert abs(P - PS * np.exp(-z / H)) / P < 1e-6
    z = altitude(PS * np.exp(-2.0), PS, G, fT, fmu)
    assert abs(z - 2.0 * H) / (2.0 * H) < 1e-5


def test_hydrostatic_type_roundtrip():
    fT = lambda P: 250.0
    fmu = lambda T, P: MU
    h = Hydrostatic.create(PS, 10.0, G, fT, fmu, N=200)
    z = np.linspace(0.0, h.zt, 20)
    P = np.asarray(h(z))
    assert P[0] == pytest.approx(PS, rel=1e-6)
    assert np.all(np.diff(P) < 0)
    # inversion consistency
    for zi, Pi in zip(z[::5], P[::5]):
        assert abs(h.altitude(Pi) - zi) < 50.0


def test_psat_h2o_reference_points():
    # triple point: 611.657 Pa at 273.16 K (Murphy & Koop report ~611.7)
    assert float(psat_h2o(273.16)) == pytest.approx(611.7, rel=2e-3)
    # 300 K: ~3536 Pa (within the liquid-branch validity range)
    assert float(psat_h2o(300.0)) == pytest.approx(3536.8, rel=3e-3)
    # boiling point is outside eq 10's fit range (123-332 K); ~1% there
    assert float(psat_h2o(373.15)) == pytest.approx(101325.0, rel=1.5e-2)
    # ice branch continuous-ish with liquid at the triple point
    assert float(psat_h2o(273.1599)) == pytest.approx(float(psat_h2o(273.1601)), rel=1e-3)


def test_tsat_co2_inverse_of_fanale():
    # Fanale et al. (1982): P = 1.2264e12 exp(-3167.8/T)
    for P in [1e2, 1e4, 5e5]:
        T = float(tsat_co2(P))
        assert 1.2264e12 * np.exp(-3167.8 / T) == pytest.approx(P, rel=1e-10)


def test_ozonelayer_shape():
    assert float(ozonelayer(1600.0)) == pytest.approx(8e-6, rel=1e-6)
    assert float(ozonelayer(99.0)) == 0.0
    assert float(ozonelayer(26000.0)) == 0.0
    assert 0.0 < float(ozonelayer(5000.0)) < 8e-6


def test_condensible_profile_freezes_above_tropopause():
    ad = DryAdiabat.create(TS, PS, CP, MU, Tstrat=210.0)
    fC = condensible_profile(ad, psat_h2o)
    Tt, Pt = tropopause(ad)
    C_strat1 = float(fC(ad(Pt / 10.0), Pt / 10.0))
    C_strat2 = float(fC(ad(Pt / 100.0), Pt / 100.0))
    assert C_strat1 == pytest.approx(C_strat2, rel=1e-12)  # uniform above
    C_surf = float(fC(TS, PS))
    assert C_surf > C_strat1  # moist below, dry aloft


def test_haircut_floors_at_saturation():
    P = np.geomspace(10.0, PS, 20)
    T = np.full(20, 120.0)
    out = np.asarray(haircut(jnp.asarray(T), jnp.asarray(P), tsat_co2))
    expect = np.maximum(120.0, np.asarray(tsat_co2(P)))
    np.testing.assert_allclose(out, expect, rtol=1e-12)


def test_rayleigh_co2_bounded():
    nu = np.linspace(3000.0, 30000.0, 50)  # visible/NIR
    a = np.asarray(rayleigh_co2(nu, 1e5, G, 0.5))
    assert np.all((a >= 0.0) & (a <= 1.0))
    # bluer light scatters more
    assert a[-1] > a[0]
