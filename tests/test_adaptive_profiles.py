"""Fixed-grid profile integrations vs the in-house adaptive Radau engine.

The reference integrates hydrostatic balance and moist adiabats with an
adaptive ScalarRadau solver (ref atmospherics.jl:87,161,441); this framework
uses dense fixed-grid RK4 at setup time (utils/ode.py, SURVEY.md §2.2) and
now carries its own adaptive Radau IIA(5) (utils/radau.py) — so the
resolution-for-adaptivity swap for the SETUP ODEs is validated in-house, not
just asserted.
"""

import numpy as np
import jax.numpy as jnp

from clearsky_tpu.atmosphere.hydrostatics import hydrostatic
from clearsky_tpu.atmosphere.adiabats import MoistAdiabat, lapse_rate_moist
from clearsky_tpu.atmosphere.saturation import psat_h2o
from clearsky_tpu.constants import R_GAS, P_MIN
from clearsky_tpu.utils.radau import radau_scalar, radau_dense

G, MU, PS = 9.8, 0.029, 1e5


def test_hydrostatic_vs_adaptive_radau():
    """dlnP/dz = -mu g/(R T(P)): RK4 fixed grid vs adaptive Radau."""
    fT = lambda P: 250.0 + 12.0 * np.log(np.maximum(P, 1.0) / 1e4)
    fmu = lambda T, P: MU

    def f(z, lnP, args):
        P = jnp.exp(lnP)
        T = 250.0 + 12.0 * jnp.log(jnp.maximum(P, 1.0) / 1e4)
        return -MU * G / (R_GAS * T) * jnp.ones_like(lnP)

    for z in [1e3, 1e4, 5e4]:
        P_rk4 = hydrostatic(z, PS, G, fT, fmu)
        r = radau_scalar(
            f, jnp.asarray([np.log(PS)]), 0.0, z, rtol=1e-10, atol=1e-12
        )
        assert bool(r.ok.all())
        P_ad = float(np.exp(r.y[0]))
        np.testing.assert_allclose(P_rk4, P_ad, rtol=1e-7)


def test_moist_adiabat_vs_adaptive_radau():
    """The moist-adiabat omega-coordinate ODE (ref atmospherics.jl:424-460):
    the fixed-grid profile must track an adaptive integration of the same
    RHS through the steep lower-atmosphere moisture gradient."""
    Ts, Pt = 300.0, 10.0
    cpn, cpv = 1040.0, 1996.0
    mun, muv, L = 0.028, 0.018, 2.3e6
    ad = MoistAdiabat.create(Ts, PS, cpn, cpv, mun, muv, L, psat_h2o, Pt=Pt)

    def f(w, T, args):
        P = jnp.maximum(w * w, P_MIN)
        return -2.0 * jnp.sqrt(P) * lapse_rate_moist(
            T, P, cpn, cpv, mun, muv, L, psat_h2o
        )

    P_check = np.array([8e4, 3e4, 1e4, 1e3, 50.0])
    ws = jnp.asarray(np.concatenate([[-np.sqrt(PS)], -np.sqrt(P_check)]))
    T_ad = np.asarray(
        radau_dense(f, jnp.asarray([Ts]), ws, rtol=1e-10, atol=1e-10)
    )[1:, 0]
    T_rk4 = np.asarray(ad(P_check))
    # 5e-4: dominated by the profile's linear interpolation between its 1000
    # omega nodes near the top of the column, not the RK4 integration (the
    # reference's adaptive path interpolates its dense output the same way,
    # ref atmospherics.jl:443); measured 1.4e-4 max at 50 Pa
    np.testing.assert_allclose(T_rk4, T_ad, rtol=5e-4)
