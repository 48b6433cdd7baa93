"""Orbits and insolation: closed-form and conservation checks.

Validates the fixed-iteration Kepler solver against the defining equation and
the insolation factors against analytic limits (ref orbits.jl, insolation.jl).
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.integrate import quad

from clearsky_tpu.constants import G_GRAV
from clearsky_tpu.orbital import (
    periapsis,
    apoapsis,
    semimajoraxis,
    eccentricity,
    meananomaly,
    trueanomaly,
    eccentricanomaly,
    orbitalperiod,
    orbitaldistance,
    orbit,
    substellarlatitude,
    hourangle,
    diurnalfluxfactor,
    diurnalfluxfactors,
    annualfluxfactor,
    annualfluxfactors,
)

AU = 1.495978707e11
M_SUN = 1.98892e30
YEAR = 365.25 * 86400.0


def test_kepler_third_law_roundtrip():
    T = float(orbitalperiod(AU, M_SUN))
    assert abs(T - YEAR) / YEAR < 2e-3
    a = float(semimajoraxis(T, M_SUN))
    assert abs(a - AU) / AU < 1e-12


def test_apsides_and_eccentricity():
    a, e = 2.0, 0.3
    rp, ra = float(periapsis(a, e)), float(apoapsis(a, e))
    assert rp == 1.4 and ra == 2.6
    assert abs(float(eccentricity(rp, ra)) - e) < 1e-15


def test_eccentric_anomaly_solves_kepler():
    for e in [0.0, 0.1, 0.5, 0.9, 0.96]:
        t = np.linspace(0.0, YEAR, 37)
        E = np.asarray(eccentricanomaly(t, AU, M_SUN, e))
        T = float(orbitalperiod(AU, M_SUN))
        M = 2 * np.pi * np.remainder(t, T) / T
        resid = np.asarray(meananomaly(E, e)) - M
        assert np.max(np.abs(resid)) < 1e-10


def test_true_anomaly_range_and_distance():
    e = 0.4
    t, r, f = orbit(AU, M_SUN, e, N=500)
    r = np.asarray(r)
    f = np.asarray(f)
    assert np.all((f >= 0) & (f < 2 * np.pi))
    assert abs(r.min() - AU * (1 - e)) / AU < 1e-6
    assert np.max(r) <= AU * (1 + e) * (1 + 1e-9)
    # distance at periapsis (t=0)
    assert abs(float(orbitaldistance(0.0, AU, M_SUN, e)) - AU * (1 - e)) < 1.0


def test_hourangle_clamps():
    # polar night: high latitude, substellar point in the other hemisphere
    assert abs(float(hourangle(1.4, -0.4))) < 1e-6  # polar night: exactly 0, never negative
    # polar day
    assert abs(float(hourangle(1.4, 0.4)) - np.pi) < 1e-6


def test_diurnal_factor_equator_zero_obliquity():
    # substellar at equator: diurnal mean of cos(zenith) over the lit half is 1/pi
    v = float(diurnalfluxfactor(0.0, 0.0))
    assert abs(v - 1.0 / np.pi) < 1e-12


def test_diurnal_factor_global_mean_quarter():
    # the global mean flux factor must be 1/4 (sphere intercepts pi R^2 / 4 pi R^2)
    f, theta, F = diurnalfluxfactors(0.4, nf=721, ntheta=721)
    theta = np.asarray(theta)
    F = np.asarray(F)
    mean_orbit = F.mean(axis=1)  # average over solar longitude
    w = np.cos(theta)
    gmean = np.trapezoid(mean_orbit * w, theta) / np.trapezoid(w, theta)
    assert abs(gmean - 0.25) < 1e-3


def test_annual_factor_matches_adaptive_quadrature():
    e, gamma, p = 0.2, 0.41, 0.6
    T = float(orbitalperiod(1.0, 1.0))
    for th in [-1.1, 0.0, 0.7]:
        ours = float(annualfluxfactor(e, th, gamma, p))
        ref, _ = quad(
            lambda t: float(diurnalfluxfactor(t, 1.0, 1.0, e, th, gamma, p)),
            0.0, T, limit=400,
        )
        assert abs(ours - ref / T) < 1e-6


def test_annualfluxfactors_batch():
    theta, F = annualfluxfactors(0.1, 0.3, 0.0, ntheta=11)
    assert np.asarray(F).shape == (11,)
    assert np.all(np.asarray(F) >= 0)


def test_hourangle_float32_poles():
    # float32's nearest pi/2 overshoots, making cos(theta) negative (-4.4e-8);
    # the denominator floor must keep polar day/night clamps correct
    th32 = jnp.float32(np.pi / 2)
    for ths, expect in [(0.3, np.pi), (-0.3, 0.0)]:
        h = float(hourangle(th32, jnp.float32(ths)))
        assert h == pytest.approx(expect, abs=1e-6)


def test_annual_factors_nonnegative_float32():
    theta = jnp.asarray(np.linspace(-np.pi / 2, np.pi / 2, 9), jnp.float32)
    F = np.asarray(annualfluxfactor(0.0167, theta, 0.41, 0.0))
    assert np.all(F >= 0.0)
    # poles get sin(gamma)/pi on an (almost) circular orbit
    assert F[0] == pytest.approx(np.sin(0.41) / np.pi, rel=1e-2)
