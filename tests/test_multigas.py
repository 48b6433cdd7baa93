"""Multi-gas integration (BASELINE configs 3-4): CO2+H2O+CIA column fluxes and
an Earth-like radiative-convective equilibrium with cached-absorber refresh.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu.absorption.cia import read_cia, CIATables
from clearsky_tpu.absorption.gas import DirectGas
from clearsky_tpu.absorption.absorbers import unify_absorbers, AcceleratedAbsorber
from clearsky_tpu.constants import R_GAS, SIGMA_SB
from clearsky_tpu.models import rcm as rcm_mod
from clearsky_tpu.rt.fluxes import radiate, Discretized
from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.utils.grids import pressuregrid, trapz

G, MU, CP, PS = 9.8, 0.029, 1e3, 1e5


@pytest.fixture(scope="module")
def absorbers(fixtures_dir):
    nu = np.linspace(100.0, 2200.0, 2048)
    co2 = DirectGas.from_lines(
        SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=1500),
        400e-6, nu,
    )
    h2o = DirectGas.from_lines(
        SpectralLines.from_par(f"{fixtures_dir}/H2O.par", maxlines=1500),
        0.01, nu,
    )
    cia = CIATables.from_data(read_cia(f"{fixtures_dir}/CO2-CO2_2018.cia"))
    return co2, h2o, cia, nu


def test_co2_h2o_cia_column_fluxes(absorbers):
    co2, h2o, cia, nu = absorbers
    P = pressuregrid(10.0, PS, 24)
    T = np.maximum(288.0 * (P / PS) ** (R_GAS / (MU * CP)), 160.0)
    F = radiate(P, G, T, MU, 0.0, 0.0, co2, h2o, cia, core=Discretized(nstream=5, nlobatto=3))
    olr = float(F.F_up[0])
    surf_up = float(F.F_up[-1])
    bb = SIGMA_SB * 288.0**4
    # fluxes finite and physically ordered: greenhouse trapping reduces OLR
    # below the surface emission; downwelling grows toward the surface
    assert np.all(np.isfinite(np.asarray(F.M_up)))
    assert 0 < olr < surf_up <= bb * 1.01
    F_down = np.asarray(F.F_down)
    assert F_down[0] == 0.0 and F_down[-1] > 0.0
    # adding H2O must deepen the greenhouse vs CO2 alone
    F_co2 = radiate(P, G, T, MU, 0.0, 0.0, co2, core=Discretized(nstream=5, nlobatto=3))
    assert olr < float(F_co2.F_up[0])


def test_multigas_rce_approaches_balance(absorbers):
    co2, h2o, cia, nu = absorbers
    Pe = pressuregrid(50.0, PS, 14)
    Te = np.maximum(275.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 170.0)
    S_tot = 240.0 / np.cos(0.841)
    fS = lambda v: jnp.full(jnp.shape(v), S_tot / (nu[-1] - nu[0]))
    r = rcm_mod.RCM.create(
        Pe, Te, G, lambda T, P: MU, fS, 0.0, lambda T, P: CP, 5e5, co2, h2o, cia
    )
    assert isinstance(r.A, AcceleratedAbsorber)
    out, _ = rcm_mod.run(r, 2e4, 150, update_every=25)
    F = rcm_mod.radiate_state(out)
    olr, absorbed = float(F.F_up[0]), float(F.F_down[0])
    # trending toward radiative balance at TOA
    F0 = rcm_mod.radiate_state(r)
    imb0 = abs(float(F0.F_up[0]) - float(F0.F_down[0]))
    imb = abs(olr - absorbed)
    assert np.all(np.isfinite(np.asarray(out.T)))
    assert imb < imb0  # imbalance shrank
    assert imb / absorbed < 0.25
