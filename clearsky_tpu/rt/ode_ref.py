"""Reference ODE solver for validation: adaptive per-wavenumber Schwarzschild.

The reference ships an adaptive Radau IIA engine as one of its two flux cores
(ClearSky.jl ``src/core/radau.jl``). Adaptive per-wavenumber ODE integration
is hostile to the XLA compilation model, so the production engine here is the
discretized core on (optionally refined) pressure grids — and THIS module is
the promised validation counterpart (SURVEY.md §7.2 "two numerical cores"):
a scipy adaptive integrator for the same Schwarzschild problem, run host-side
per wavenumber, used by the test suite to demonstrate that the discretized
core converges to the adaptive solution as the grid refines.

Not a production path: slow, CPU-only, float64.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp

from ..constants import N_AVOGADRO
from ..ops.planck import planck
from ..utils.quadrature import stream_nodes

__all__ = ["ode_outgoing", "ode_optical_depth"]


def _sigma_at(A, T, P):
    """Dense sigma row [n_nu] from any absorber stack at scalar (T, P)."""
    import jax.numpy as jnp

    return np.asarray(A.sigma(jnp.asarray(T), jnp.asarray(P)))


def ode_outgoing(
    Ps: float,
    g: float,
    fT,
    fmu,
    A,
    Ptop: float = 1.0,
    nstream: int = 5,
    rtol: float = 1e-8,
    atol: float = 1e-10,
    vertical: bool = False,
):
    """OLR spectrum [n_nu] by adaptive integration of dI/d(omega) per stream.

    Equivalent problem to the reference's Radau ``outgoing`` path
    (ref fluxes.jl:133-158, radau.jl:133-157): upward Schwarzschild integration
    from surface Planck emission in omega = -sqrt(P) coordinates.
    """
    nu = np.asarray(A.nu)
    if vertical:
        m, W = np.array([1.0]), np.array([np.pi])
    else:
        m, W = stream_nodes(nstream)
    Ts = float(np.asarray(fT(Ps)))
    B_surf = np.asarray(planck(nu, Ts))
    w1, w2 = -np.sqrt(Ps), -np.sqrt(Ptop)

    def rhs_factory(mk):
        def rhs(w, I):
            P = w * w
            T = float(np.asarray(fT(P)))
            mu = float(np.asarray(fmu(T, P)))
            sig = _sigma_at(A, T, P)
            dtau_dP = 1e-4 * sig * N_AVOGADRO / (mu * g)
            B = np.asarray(planck(nu, T))
            # dI/domega = dI/dP * dP/domega; dP/domega = 2w (negative upward)
            return mk * dtau_dP * (2.0 * w) * (I - B)

        return rhs

    out = np.zeros_like(nu, dtype=np.float64)
    for k in range(len(m)):
        sol = solve_ivp(
            rhs_factory(float(m[k])),
            (w1, w2),
            B_surf.astype(np.float64),
            method="Radau",
            rtol=rtol,
            atol=atol,
        )
        if not sol.success:
            raise RuntimeError(f"reference ODE integration failed: {sol.message}")
        out += W[k] * sol.y[:, -1]
    return out


def ode_optical_depth(
    P1: float,
    P2: float,
    g: float,
    fT,
    fmu,
    A,
    theta: float = 0.0,
    rtol: float = 1e-9,
    atol: float = 1e-12,
):
    """Slant-path optical depth [n_nu] by adaptive integration (ref radau.jl:76-110)."""
    nu = np.asarray(A.nu)
    hi, lo = max(P1, P2), min(P1, P2)
    w1, w2 = -np.sqrt(hi), -np.sqrt(lo)
    msec = 1.0 / np.cos(theta)

    def rhs(w, tau):
        P = w * w
        T = float(np.asarray(fT(P)))
        mu = float(np.asarray(fmu(T, P)))
        sig = _sigma_at(A, T, P)
        return -msec * 1e-4 * sig * N_AVOGADRO / (mu * g) * (2.0 * w)

    sol = solve_ivp(
        rhs, (w1, w2), np.zeros_like(nu, dtype=np.float64),
        method="Radau", rtol=rtol, atol=atol,
    )
    if not sol.success:
        raise RuntimeError(f"reference ODE integration failed: {sol.message}")
    return sol.y[:, -1]
