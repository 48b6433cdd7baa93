"""HITRAN ingestion tests: .par parser, molparam/TIPS table, SpectralLines, .cia."""

import numpy as np
import pytest

from clearsky_tpu.spectra.par import read_par
from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.spectra.molparam import molparam, iso_index, n_molecules
from clearsky_tpu.absorption.cia import read_cia, CIATables


# ---------------------------------------------------------------- molparam
def test_molparam_properties():
    """Property tests mirroring the reference suite (ref test/test_molparam.jl)."""
    for M in range(1, n_molecules() + 1):
        try:
            mp = molparam(M)
        except KeyError:
            continue  # unassigned molecule numbers (50-52, 54)
        assert np.all(mp.maxrelerr <= 0.01)
        for j in range(mp.n_iso):
            if mp.hascheb[j]:
                assert mp.ncheb[j] > 0
                assert not np.any(np.isnan(mp.cheb[j]))
            else:
                assert np.all(mp.cheb[j] == 0.0)
        if mp.n_iso > 1:
            assert mp.A.sum() <= 1.001


def test_molparam_known_values():
    h2o = molparam(1)
    assert h2o.formula == "H2O"
    assert h2o.A[0] == pytest.approx(0.997317)
    assert h2o.mu[0] == pytest.approx(0.018010565)
    co2 = molparam(2)
    assert co2.formula == "CO2"
    assert co2.Qref[0] == pytest.approx(286.09)


def test_iso_index_mapping():
    assert iso_index("1") == 1
    assert iso_index("0") == 10
    assert iso_index("A") == 11
    assert iso_index("Z") == 36


# ---------------------------------------------------------------- .par parsing
@pytest.fixture(scope="module")
def h2o_par(fixtures_dir):
    return read_par(f"{fixtures_dir}/H2O.par")


def test_par_parse_counts(fixtures_dir, h2o_par):
    with open(f"{fixtures_dir}/H2O.par", "rb") as f:
        n_lines = sum(1 for _ in f)
    assert len(h2o_par["nu"]) == n_lines


def test_par_sorted_and_sane(h2o_par):
    assert np.all(np.diff(h2o_par["nu"]) >= 0)
    assert np.all(h2o_par["S"] > 0)
    assert np.all(h2o_par["M"] == 1)
    assert np.all(h2o_par["ga"] >= 0)


def test_par_first_record_golden(fixtures_dir):
    """Golden check: parse the first physical record by hand and compare."""
    with open(f"{fixtures_dir}/CO2.par") as f:
        line = f.readline().rstrip("\n")
    par = read_par(f"{fixtures_dir}/CO2.par")
    nu0 = float(line[3:15])
    i = int(np.argmin(np.abs(par["nu"] - nu0)))
    assert par["nu"][i] == pytest.approx(nu0)
    assert par["S"][i] == pytest.approx(float(line[15:25]))
    assert par["Epp"][i] == pytest.approx(float(line[45:55]))
    assert par["na"][i] == pytest.approx(float(line[55:59]))


def test_par_filters(fixtures_dir):
    par = read_par(f"{fixtures_dir}/CO2.par", numin=600.0, numax=700.0)
    assert np.all((par["nu"] >= 600.0) & (par["nu"] <= 700.0))
    par2 = read_par(f"{fixtures_dir}/CO2.par", Scut=1e-22)
    assert np.all(par2["S"] >= 1e-22)
    par3 = read_par(f"{fixtures_dir}/CO2.par", maxlines=100)
    assert len(par3["nu"]) == 100
    # maxlines keeps the strongest
    full = read_par(f"{fixtures_dir}/CO2.par")
    assert par3["S"].min() >= np.sort(full["S"])[-100]
    par4 = read_par(f"{fixtures_dir}/CO2.par", I=["1"])
    assert set(par4["I"]) == {"1"}
    par5 = read_par(f"{fixtures_dir}/CO2.par", I=[1, 2])
    assert set(par5["I"]) <= {"1", "2"}


def test_par_filter_to_nothing_raises(fixtures_dir):
    with pytest.raises(ValueError):
        read_par(f"{fixtures_dir}/CO2.par", numin=1e9)


# ---------------------------------------------------------------- SpectralLines
def test_spectral_lines_resolution(fixtures_dir):
    sl = SpectralLines.from_par(f"{fixtures_dir}/CH4.par")
    assert sl.formula == "CH4"
    assert sl.M == 6
    mp = molparam(6)
    iso = np.asarray(sl.iso)
    assert np.allclose(np.asarray(sl.mu), mp.mu[iso - 1])
    assert np.allclose(np.asarray(sl.A), mp.A[iso - 1])
    assert np.all(np.diff(np.asarray(sl.nu)) >= 0)
    # mean molar mass near CH4's ~0.016 kg/mole
    assert sl.mean_molar_mass == pytest.approx(0.016, abs=0.001)


# ---------------------------------------------------------------- .cia parsing
@pytest.fixture(scope="module")
def co2co2(fixtures_dir):
    return read_cia(f"{fixtures_dir}/CO2-CO2_2018.cia")


def test_cia_parse(co2co2):
    assert all(d["symbol"] == "CO2-CO2" for d in co2co2)
    for d in co2co2:
        assert len(d["nu"]) == d["npts"]
        assert d["nu"][0] == pytest.approx(d["numin"], abs=1.0)
        assert d["nu"][-1] == pytest.approx(d["numax"], abs=1.0)


def test_cia_tables_eval(co2co2):
    x = CIATables.from_data(co2co2)
    # pick a point well inside the first multi-T grid
    gnu, gT, glogk = x.grids[0]
    nu0 = 0.5 * (gnu[0] + gnu[-1])
    T0 = 0.5 * (gT[0] + gT[-1])
    k = x(nu0, T0)
    assert k > 0
    # at an exact grid point the interpolation is exact
    k2 = x(gnu[3], gT[1])
    assert k2 == pytest.approx(np.exp(glogk[3, 1]), rel=1e-12)
    # outside T range without extrapolation -> 0
    assert x(nu0, gT[-1] + 500.0) == 0.0
    xe = CIATables.from_data(co2co2, extrapolate=True)
    assert xe(nu0, gT[-1] + 500.0) > 0


def test_bound_cia_matches_host(co2co2):
    import jax.numpy as jnp

    x = CIATables.from_data(co2co2)
    gnu, gT, _ = x.grids[0]
    nu_grid = np.linspace(gnu[0], gnu[-1], 64)
    b = x.bind(nu_grid)
    T0 = 0.5 * (gT[0] + gT[-1])
    dev = np.asarray(b.k(jnp.asarray(T0)))
    host = np.array([x(v, T0) for v in nu_grid])
    assert np.allclose(dev, host, rtol=1e-10)
