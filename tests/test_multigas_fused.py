"""Fused multi-molecule gas (MultiGas) vs separate DirectGas objects."""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu import SpectralLines, DirectGas, MultiGas
from clearsky_tpu.spectra.merge import merge_lines


@pytest.fixture(scope="module")
def catalogs(fixtures_dir):
    co2 = SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=400)
    h2o = SpectralLines.from_par(f"{fixtures_dir}/H2O.par", maxlines=400)
    return co2, h2o


def test_merge_preserves_lines(catalogs):
    co2, h2o = catalogs
    merged, conc = merge_lines([(co2, 4e-4), (h2o, 1e-2)])
    assert merged.n_lines == co2.n_lines + h2o.n_lines
    nu = np.asarray(merged.nu)
    assert np.all(np.diff(nu) >= 0)
    # every original line present
    assert np.allclose(
        np.sort(np.concatenate([np.asarray(co2.nu), np.asarray(h2o.nu)])), nu
    )
    c = np.asarray(conc)
    assert set(np.unique(c)) == {4e-4, 1e-2}
    # TIPS rows resolve: iso_ptr in range
    assert int(np.asarray(merged.iso_ptr).max()) < np.asarray(merged.tips_coeffs).shape[0]


def test_multigas_matches_sum_of_directgas(catalogs):
    co2, h2o = catalogs
    nu = np.linspace(200.0, 2000.0, 1024)
    g_multi = MultiGas.from_lines([(co2, 4e-4), (h2o, 1e-2)], nu)
    g_co2 = DirectGas.from_lines(co2, 4e-4, nu)
    g_h2o = DirectGas.from_lines(h2o, 1e-2, nu)
    T = jnp.asarray([230.0, 290.0])
    P = jnp.asarray([1e3, 9e4])
    fused = np.asarray(g_multi(T, P))
    split = np.asarray(g_co2(T, P)) + np.asarray(g_h2o(T, P))
    m = split > 0
    np.testing.assert_allclose(fused[m], split[m], rtol=1e-10)
    # two-sided: no spurious fused opacity where the split sum is exactly 0
    assert np.all(np.abs(fused[~m]) <= split.max() * 1e-12)


def test_merge_rejects_bad_concentration(catalogs):
    co2, _ = catalogs
    with pytest.raises(ValueError, match="concentration"):
        merge_lines([(co2, 1.5)])


def test_multigas_variable_concentration_matches_split(catalogs):
    """fC(T, P) generality in the fused path (ref gases.jl:278): per-line
    concentrations gathered from per-molecule fC feed both the intensity
    scaling and the self-broadening partial pressure."""
    co2, h2o = catalogs
    nu = np.linspace(200.0, 2000.0, 1024)

    def fC_h2o(T, P):  # condensible-like: falls off with cold temperatures
        return 1e-2 * jnp.exp(-((280.0 - jnp.asarray(T)) / 60.0) ** 2)

    g_multi = MultiGas.from_lines([(co2, 4e-4), (h2o, fC_h2o)], nu)
    assert g_multi.mol_ptr is not None and len(g_multi.fCs) == 2
    g_co2 = DirectGas.from_lines(co2, 4e-4, nu)
    g_h2o = DirectGas.from_lines(h2o, fC_h2o, nu)
    T = jnp.asarray([230.0, 290.0])
    P = jnp.asarray([1e3, 9e4])
    fused = np.asarray(g_multi(T, P))
    split = np.asarray(g_co2(T, P)) + np.asarray(g_h2o(T, P))
    m = split > 0
    np.testing.assert_allclose(fused[m], split[m], rtol=1e-10)
    # two-sided: no spurious fused opacity where the split sum is exactly 0
    assert np.all(np.abs(fused[~m]) <= split.max() * 1e-12)


def test_sharded_multigas_variable_concentration(catalogs):
    """The nu-sharded fused path with per-molecule fC(T, P)."""
    from clearsky_tpu.absorption.sharded import shard_line_gas

    co2, h2o = catalogs
    nu = np.linspace(200.0, 2000.0, 1024)

    def fC_h2o(T, P):
        return 1e-2 * jnp.exp(-((280.0 - jnp.asarray(T)) / 60.0) ** 2)

    g_multi = MultiGas.from_lines([(co2, 4e-4), (h2o, fC_h2o)], nu)
    sg = shard_line_gas(g_multi, 8)
    T = jnp.asarray([230.0, 290.0])
    P = jnp.asarray([1e3, 9e4])
    ref = np.asarray(g_multi.raw_sigma(T, P))
    got = np.asarray(sg.raw_sigma(T, P))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=ref.max() * 1e-15)


def test_cia_pairs_with_multigas_components(catalogs, fixtures_dir):
    """CIA auto-pairing works through a fused MultiGas (component views)."""
    import jax.numpy as jnp
    from clearsky_tpu.absorption.cia import CIATables
    from clearsky_tpu.absorption.absorbers import AbsorberStack

    co2, h2o = catalogs
    nu = np.linspace(200.0, 2000.0, 512)
    cia = CIATables.from_file(f"{fixtures_dir}/CO2-CO2_2018.cia")
    mix = MultiGas.from_lines([(co2, 0.7), (h2o, 1e-3)], nu)
    stack_fused = AbsorberStack.create(mix, cia)
    assert len(stack_fused.cias) == 1
    # split construction: same physics
    g_co2 = DirectGas.from_lines(co2, 0.7, nu)
    g_h2o = DirectGas.from_lines(h2o, 1e-3, nu)
    stack_split = AbsorberStack.create(g_co2, g_h2o, cia)
    T = jnp.asarray([250.0, 300.0])
    P = jnp.asarray([1e4, 9e4])
    np.testing.assert_allclose(
        np.asarray(stack_fused.sigma(T, P)),
        np.asarray(stack_split.sigma(T, P)),
        rtol=1e-9,
    )
