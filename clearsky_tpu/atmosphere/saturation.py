"""Saturation curves, composition profiles, and miscellaneous column utilities.

Equivalent of ClearSky.jl ``atmospherics.jl:517-658``: Murphy & Koop H2O
saturation pressure, Fanale CO2 saturation temperature, the triangular ozone
layer, condensible concentration profiles, the saturation "haircut", and CO2
Rayleigh scattering. All evaluators are branch-free jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import P_ATM
from ..ops.planck import nu2lam
from .adiabats import tropopause

__all__ = [
    "psat_h2o",
    "tsat_co2",
    "ozonelayer",
    "condensible_profile",
    "haircut",
    "rayleigh_co2",
]


def psat_h2o(T):
    """Saturation vapor pressure of water [Pa], Murphy & Koop (2005) eqs 7/10.

    Ref atmospherics.jl:528-541: eq 10 for T >= 273.15 K, eq 7 (ice) below.
    """
    T = jnp.asarray(T)
    a = jnp.log(T)
    b = 1.0 / T
    c = 53.878 - 1331.22 * b - 9.44523 * a + 0.014025 * T
    d = c * jnp.tanh(0.0415 * (T - 218.8))
    warm = jnp.exp(54.842763 - 6763.22 * b - 4.21 * a + 3.67e-4 * T + d)
    cold = jnp.exp(9.550426 - 5723.265 * b + 3.53068 * a - 0.00728332 * T)
    return jnp.where(T >= 273.15, warm, cold)


def tsat_co2(P):
    """CO2 saturation temperature [K], Fanale et al. (1982) eq 19 inverted.

    Ref atmospherics.jl:552-557. Valid for P <= 518000 Pa.
    """
    A = 1.2264e12  # [Pa]
    B = -3167.8  # [K]
    return B / jnp.log(jnp.asarray(P) / A)


def ozonelayer(P, Cmax: float = 8e-6):
    """Triangular-in-lnP ozone concentration: peak Cmax at 1600 Pa, zero at
    100 and 25500 Pa. Ref atmospherics.jl:567-578."""
    lnP = jnp.log(jnp.asarray(P))
    P1 = 10.146433731146518  # ln(25500)
    P2 = 7.3777589082278725  # ln(1600)
    P3 = 4.605170185988092   # ln(100)
    upper = Cmax * (P1 - lnP) / (P1 - P2)
    lower = Cmax * (lnP - P3) / (P2 - P3)
    out = jnp.where((lnP >= P2) & (lnP <= P1), upper, 0.0)
    return jnp.where((lnP >= P3) & (lnP < P2), lower, out)


def condensible_profile(adiabat, fPsat):
    """Concentration function fC(T, P) for a condensible with uniform
    stratospheric mixing above the tropopause. Ref atmospherics.jl:591-610.

    Requires the adiabat to have an isothermal stratosphere (Tstrat/Ptropo).
    Lower-atmosphere concentration is Psat(T)/(Psat(T) + P); above the
    tropopause it is frozen at the tropopause value.
    """
    Tt, Pt = tropopause(adiabat)
    Pst = fPsat(Tt)

    def fC(T, P):
        Ps = fPsat(T)
        below = Ps / (Ps + P)
        above = Pst / (Pt + Pst)
        return jnp.where(jnp.asarray(P) >= Pt, below, above)

    return fC


def haircut(T, P, fTsat):
    """Floor a temperature profile at the saturation temperature.

    Functional version of the reference's in-place ``haircut!``
    (ref atmospherics.jl:629-638).
    """
    return jnp.maximum(jnp.asarray(T), fTsat(jnp.asarray(P)))


def rayleigh_co2(nu, Ps, g, theta):
    """CO2 Rayleigh-scattering albedo, Hansen & Travis (1974) two-stream form.

    The reference's version (ref atmospherics.jl:640-658) ends with an
    expression whose (1-R^-) factors cancel, reducing to R^+ — flagged as an
    unfinished formula in SURVEY.md. This implements the standard
    Hansen-Travis semi-infinite two-stream combination
    R = 1 - (1 - R^+)(1 - R^-)/(1 + f) is not standard either; we use the
    plane albedo of a finite purely scattering layer over a black surface:
    R = ((0.5 - gam*mu)*beta + f)/(1 + f) with beta = 1 - exp(-tau/mu),
    f = gam*tau, gam = 3/4 — the direct-beam term (their R^-), which is the
    physically meaningful reflectance here.
    """
    lam = nu2lam(jnp.asarray(nu)) * 1e6  # micrometers
    tau0 = 1.527 * (1.0 / lam**4) * (1.0 + 0.013 / lam**2)
    tau0 = tau0 * 8.7 / (93.0 * P_ATM)
    tau = (Ps / g) * tau0
    gam = 0.75
    mu = jnp.cos(theta)
    beta = 1.0 - jnp.exp(-tau / mu)
    f = gam * tau
    return ((0.5 - gam * mu) * beta + f) / (1.0 + f)
