"""Oracle gates for the fully-fused table-OLR kernel (rt.fused_table).

The unfused split-precision pipeline (raw_sigma -> layer_tau_flat ->
_olr_scan) is the correctness oracle; the fused kernel must reproduce it to
reduction-order roundoff in interpret mode, and its custom JVP must agree
with the unfused JVP.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.absorption.gas import Gas
from clearsky_tpu.absorption.domain import AtmosphericDomain
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.utils.grids import pressuregrid
from clearsky_tpu.utils.interp import interp_linear
from clearsky_tpu.rt.fused_table import (
    table_olr_fused, table_olr_fused_ref, fused_table_applicable,
)

G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0


@pytest.fixture(scope="module")
def setup(fixtures_dir):
    co2 = SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=300)
    nu_l = np.asarray(co2.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, 1500)
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    gas = Gas.from_lines(co2, 0.95, nu, dom, dtype=jnp.float32)
    gs = gas.split_precision(16)
    Pe = pressuregrid(PT, PS, 12)
    Te = np.maximum(288.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe = jnp.log(jnp.asarray(Pe))
    Tj = jnp.asarray(Te, jnp.float32)
    fT = lambda P: interp_linear(jnp.log(P), lnPe, Tj).astype(jnp.float32)
    return gs, jnp.asarray(Pe, jnp.float32), fT


def test_fused_matches_unfused_oracle(setup):
    gs, Pe, fT = setup
    fmu = lambda T, P: MU
    olr_k = np.asarray(table_olr_fused(gs, Pe, G, fT, fmu, interpret=True))
    olr_o = np.asarray(table_olr_fused_ref(gs, Pe, G, fT, fmu, 3, 5))
    pk = np.abs(olr_o).max()
    assert pk > 0
    # interpret-mode kernel and XLA pipeline share f32 arithmetic; only
    # reduction order differs
    np.testing.assert_allclose(olr_k, olr_o, rtol=2e-5, atol=2e-5 * pk)


def test_fused_applicability_gate(setup):
    from clearsky_tpu.absorption.absorbers import unify_absorbers
    from clearsky_tpu.absorption.gas import GrayGas

    gs, Pe, fT = setup
    assert fused_table_applicable(gs)
    assert fused_table_applicable(unify_absorbers((gs,)))
    gray = GrayGas.create(1e-28, np.asarray(gs.nu, np.float64))
    assert not fused_table_applicable(unify_absorbers((gs, gray)))
    assert not fused_table_applicable(gray)


def test_fused_jvp_rides_unfused(setup):
    gs, Pe, fT = setup
    fmu = lambda T, P: MU

    def f(dT):
        fTs = lambda P: fT(P) + dT
        return table_olr_fused(gs, Pe, G, fTs, fmu, interpret=True).sum()

    g1 = float(jax.grad(f)(jnp.asarray(0.0, jnp.float32)))
    eps = 1e-2
    fd = (float(f(jnp.asarray(eps, jnp.float32)))
          - float(f(jnp.asarray(-eps, jnp.float32)))) / (2 * eps)
    assert np.isfinite(g1)
    np.testing.assert_allclose(g1, fd, rtol=5e-3)


def test_outgoing_auto_routes_to_fused(setup):
    """rt.fluxes.outgoing must route a single split-precision table gas
    through the fused kernel (march_kernel_mode('interpret') stands in for
    the TPU) and agree with the standard pipeline."""
    from clearsky_tpu.rt.discretized import march_kernel_mode
    from clearsky_tpu.rt.fluxes import outgoing

    gs, Pe, fT = setup
    Te = np.asarray(fT(Pe))
    olr_std = np.asarray(outgoing(np.asarray(Pe, np.float64), G, Te, MU, gs))
    with march_kernel_mode("interpret"):
        olr_fused = np.asarray(
            outgoing(np.asarray(Pe, np.float64), G, Te, MU, gs)
        )
    pk = np.abs(olr_std).max()
    np.testing.assert_allclose(olr_fused, olr_std, rtol=1e-4, atol=1e-4 * pk)


def test_fused_monoflux_matches_unfused_oracle(setup):
    """The both-marches fused kernel (coefficients -> tau -> down+beam+
    surface+up) against the unfused split pipeline, beam and albedo active."""
    from clearsky_tpu.rt.fused_table import table_monoflux_fused, _unfused_tau
    from clearsky_tpu.rt.discretized import _monoflux_scan, layer_tau_flat, lobatto_pressures
    from clearsky_tpu.ops.planck import planck

    gs, Pe, fT = setup
    fmu = lambda T, P: MU
    n_nu = gs.nu.shape[0]
    S = jnp.asarray(np.linspace(0.1, 0.4, n_nu), jnp.float32)
    a = jnp.asarray(np.full(n_nu, 0.3), jnp.float32)
    up_k, dn_k, tau_k = table_monoflux_fused(
        gs, Pe, G, fT, fmu, S, a, 0.841, interpret=True)
    # unfused twin
    Pn = lobatto_pressures(Pe, 3).reshape(-1)
    Tn = fT(Pn)
    sig = gs.raw_sigma(Tn, Pn)
    mun = jnp.full_like(Pn, MU)
    Cn = jnp.asarray(gs.fC(Tn, Pn)) * jnp.ones_like(Pn)
    tau_o = layer_tau_flat(Pe, mun / Cn, sig, G, 3)
    B = planck(gs.nu[None, :], fT(Pe)[:, None])
    ct = jnp.cos(jnp.asarray(0.841, jnp.float32))
    up_o, dn_o = _monoflux_scan(tau_o.astype(jnp.float32),
                                B.astype(jnp.float32), S, a, ct, 5)
    pk = float(np.abs(np.asarray(up_o)).max())
    np.testing.assert_allclose(np.asarray(tau_k), np.asarray(tau_o),
                               rtol=3e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(up_k), np.asarray(up_o),
                               rtol=5e-5, atol=5e-5 * pk)
    np.testing.assert_allclose(np.asarray(dn_k), np.asarray(dn_o),
                               rtol=5e-5, atol=5e-5 * pk)


def test_monochromatic_fluxes_auto_routes_to_fused(setup):
    """rt.fluxes.monochromatic_fluxes routes a single split table gas
    through the fused mono kernel and agrees with the standard pipeline."""
    from clearsky_tpu.rt.discretized import march_kernel_mode
    from clearsky_tpu.rt.fluxes import monochromatic_fluxes

    gs, Pe, fT = setup
    Te = np.asarray(fT(Pe))
    args = (np.asarray(Pe, np.float64), G, Te, MU, 0.3, 0.2, gs)
    up_s, dn_s, tau_s = monochromatic_fluxes(*args)
    with march_kernel_mode("interpret"):
        up_f, dn_f, tau_f = monochromatic_fluxes(*args)
    pk = float(np.abs(np.asarray(up_s)).max())
    np.testing.assert_allclose(np.asarray(up_f), np.asarray(up_s),
                               rtol=1e-4, atol=1e-4 * pk)
    np.testing.assert_allclose(np.asarray(dn_f), np.asarray(dn_s),
                               rtol=1e-4, atol=1e-4 * pk)
    np.testing.assert_allclose(np.asarray(tau_f), np.asarray(tau_s),
                               rtol=1e-4, atol=1e-12)


def test_fused_monoflux_jvp_rides_unfused(setup):
    from clearsky_tpu.rt.fused_table import table_monoflux_fused

    gs, Pe, fT = setup
    fmu = lambda T, P: MU
    n_nu = gs.nu.shape[0]
    S = jnp.asarray(np.full(n_nu, 0.2), jnp.float32)
    a = jnp.asarray(np.full(n_nu, 0.3), jnp.float32)

    def f(dT):
        fTs = lambda P: fT(P) + dT
        up, dn, _ = table_monoflux_fused(gs, Pe, G, fTs, fmu, S, a, 0.841,
                                         interpret=True)
        return (up.sum() - dn.sum())

    g1 = float(jax.grad(f)(jnp.asarray(0.0, jnp.float32)))
    eps = 1e-2
    fd = (float(f(jnp.asarray(eps, jnp.float32)))
          - float(f(jnp.asarray(-eps, jnp.float32)))) / (2 * eps)
    assert np.isfinite(g1)
    np.testing.assert_allclose(g1, fd, rtol=5e-3)
