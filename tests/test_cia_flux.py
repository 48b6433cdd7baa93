"""CIA inside the flux pipeline: pairing with gases, sigma summation, OLR effect.

The reference couples CIA continua to gas partial pressures through the CIA
struct (ref collision_induced_absorption.jl:431-465); these tests exercise
that full path against the bundled CO2-CO2 fixture.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu.absorption.cia import read_cia, CIATables, cia_xsec
from clearsky_tpu.absorption.gas import DirectGas, GrayGas
from clearsky_tpu.absorption.absorbers import unify_absorbers
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.rt.fluxes import outgoing
from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.utils.grids import trapz


@pytest.fixture(scope="module")
def stack(fixtures_dir):
    lines = SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=300)
    nu = np.linspace(1.0, 500.0, 256)  # CO2-CO2 CIA band region
    co2 = DirectGas.from_lines(lines, 0.95, nu)
    cia = CIATables.from_data(read_cia(f"{fixtures_dir}/CO2-CO2_2018.cia"))
    return co2, cia, nu


def test_stack_pairs_cia_with_gas(stack):
    co2, cia, nu = stack
    A = unify_absorbers((co2, cia))
    assert len(A.cias) == 1
    pair = A.cias[0]
    # both partners of CO2-CO2 resolve to the CO2 gas (stored as lightweight
    # formula+concentration component views, see CIA.pair)
    assert pair.g1.formula == "CO2" and pair.g2.formula == "CO2"
    assert pair.g1.fC is co2.fC and pair.g2.fC is co2.fC


def test_cia_increases_sigma_and_depth(stack):
    co2, cia, nu = stack
    A_gas = unify_absorbers((co2,))
    A_full = unify_absorbers((co2, cia))
    T = jnp.asarray([250.0])
    P = jnp.asarray([5e4])
    s_gas = np.asarray(A_gas.sigma(T, P))[0]
    s_full = np.asarray(A_full.sigma(T, P))[0]
    assert np.all(s_full >= s_gas - 1e-30)
    assert s_full.sum() > s_gas.sum()  # the continuum adds opacity somewhere


def test_cia_lowers_band_olr(stack):
    co2, cia, nu = stack
    fT = lambda P: jnp.maximum(280.0 * (jnp.asarray(P) / 1e5) ** (R_GAS / (0.044 * 850.0)), 150.0)
    fmu = lambda T, P: 0.044
    olr_gas = float(trapz(nu, outgoing(1e5, 9.8, fT, fmu, co2, Ptop=10.0, nlevels=64)))
    olr_full = float(
        trapz(nu, outgoing(1e5, 9.8, fT, fmu, co2, cia, Ptop=10.0, nlevels=64))
    )
    assert olr_full < olr_gas  # extra continuum opacity must reduce OLR
    assert olr_full > 0.2 * olr_gas  # and not absurdly so


def test_cia_xsec_amagat_conversion(stack):
    # scalar sanity: cross-section positive in the band, zero far outside
    _, cia, nu = stack
    bound = cia.bind(np.asarray(nu))
    k = bound.k(jnp.asarray(250.0))
    s = np.asarray(cia_xsec(k, 250.0, 5e4, 5e4, 5e4))
    assert s.shape == (len(np.asarray(nu)),)
    assert np.all(s >= 0.0) and s.max() > 0.0
