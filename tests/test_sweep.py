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
        np.testing.assert_allclose(Hb[i], H, rtol=1e-11)


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
