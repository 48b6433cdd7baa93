"""Batched RCE sweep (BASELINE config 5): vmapped columns, insolation factors,
mesh sharding, and physical ordering of the equilibria."""

import numpy as np
import jax
import jax.numpy as jnp

from clearsky_tpu.absorption.gas import GrayGas
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.models import rcm as rcm_mod
from clearsky_tpu.models.sweep import batched_heating, run_sweep, shard_sweep
from clearsky_tpu.orbital import annualfluxfactors
from clearsky_tpu.parallel import spectral_mesh
from clearsky_tpu.utils.grids import pressuregrid, logrange

G, MU, CP, PS = 9.8, 0.029, 1e3, 1e5


def make_rcm(nnu=256):
    nu = np.concatenate([logrange(1e-6, 1e4, nnu - 1, 3), [1e5]])
    gas = GrayGas.create(3e-27, nu)
    Pe = pressuregrid(10.0, PS, 16)
    Te = np.maximum(250.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 150.0)
    S0 = 340.0 / np.cos(0.841)
    fS = lambda v: jnp.full(jnp.shape(v), S0 / (1e5 - 1e-6))  # actual grid span
    return rcm_mod.RCM.create(
        Pe, Te, G, lambda T, P: MU, fS, 0.1, lambda T, P: CP, 1e6, gas
    )


def test_batched_heating_matches_loop():
    r = make_rcm()
    factors = jnp.asarray([0.5, 1.0, 1.5])
    Tb = jnp.stack([r.T, r.T * 1.02, r.T * 0.98])
    Hb = np.asarray(batched_heating(r, Tb, factors))
    import dataclasses

    for i, f in enumerate([0.5, 1.0, 1.5]):
        ri = dataclasses.replace(r, S_nu=r.S_nu * f)
        H = np.asarray(rcm_mod.heating(ri, Tb[i]))
        # vmap-vs-loop reassociation only (the march's series/exp omt
        # polynomial fuses differently under vmap; measured 7.5e-11 on
        # near-zero stratospheric cells) — same 1e-9 class as the sharding
        # equivalence gates
        np.testing.assert_allclose(Hb[i], H, rtol=1e-9)


def test_run_sweep_orders_by_insolation():
    # hotter insolation must equilibrate to a warmer surface
    r = make_rcm(nnu=150)
    factors = jnp.asarray([0.25, 1.0, 2.0])
    T_b, A_b = run_sweep(r, factors, dt=2e4, nsteps=250, update_every=0)
    T_b = np.asarray(T_b)
    assert np.all(np.isfinite(T_b))
    surf = T_b[:, -1]
    assert surf[0] < surf[1] < surf[2]


def test_sweep_with_latitude_factors_and_mesh():
    r = make_rcm()
    theta, F = annualfluxfactors(0.0167, 0.41, 0.0, ntheta=4)
    mesh = spectral_mesh(n_batch=2)
    r_s, f_s, T_s = shard_sweep(mesh, r, 4.0 * jnp.asarray(F))
    Hb = jax.jit(batched_heating)(r_s, T_s, f_s)
    Hb = np.asarray(Hb)
    assert Hb.shape == (4, 16)
    assert np.all(np.isfinite(Hb))
    # equator (middle latitudes) receives more flux -> less cooling at surface
    # (factors F are symmetric: F[1], F[2] inner > F[0], F[3] poles)
    assert np.asarray(F)[1] > np.asarray(F)[0]


def test_run_sweep_multigas_lbl(fixtures_dir):
    """LBL sweep (config 5 with real gases): a fused CO2+H2O MultiGas column
    batch must integrate on the sweep path with refresh + adjustment cadences
    and match the single-column run loop per factor. Anchor: the
    insolation-driven sweep on ref insolation.jl:65-94."""
    import dataclasses
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.absorption.gas import MultiGas

    co2 = SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=150)
    h2o = SpectralLines.from_par(f"{fixtures_dir}/H2O.par", maxlines=100)
    nu_l = np.asarray(co2.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, 128)
    mg = MultiGas.from_lines([(co2, 0.9), (h2o, 0.005)], nu)
    Pe = pressuregrid(10.0, PS, 10)
    Te = np.maximum(260.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 150.0)
    S0 = 340.0 / np.cos(0.841)
    span = float(nu[-1] - nu[0])
    fS = lambda v: jnp.full(jnp.shape(v), S0 / span)
    r = rcm_mod.RCM.create(
        Pe, Te, G, lambda T, P: MU, fS, 0.1, lambda T, P: CP, 1e6, mg
    )
    factors = jnp.asarray([0.5, 1.0, 2.0])
    T_b, A_b = run_sweep(
        r, factors, dt=2e4, nsteps=6, update_every=2,
        adjust_every=3, cp=CP, mu=MU,
    )
    T_b = np.asarray(T_b)
    assert np.all(np.isfinite(T_b))
    # per-factor equivalence with the single-column composed loop
    for i, f in enumerate([0.5, 1.0, 2.0]):
        ri = dataclasses.replace(r, S_nu=r.S_nu * f)
        out, _ = rcm_mod.run(
            ri, 2e4, 6, update_every=2, adjust_every=3, cp=CP, mu=MU
        )
        np.testing.assert_allclose(T_b[i], np.asarray(out.T), rtol=1e-10)
