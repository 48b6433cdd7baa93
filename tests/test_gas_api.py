"""Gas API parity surface: alias constructors, wavenumber slicing, raw/scaled."""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu import (
    AtmosphericDomain,
    Gas,
    WellMixedGas,
    VariableGas,
)


@pytest.fixture(scope="module")
def baked(fixtures_dir):
    nu = np.linspace(640.0, 680.0, 48)
    domain = AtmosphericDomain.create((150.0, 350.0), 6, (10.0, 1e5), 8)
    gas = WellMixedGas(f"{fixtures_dir}/CO2.par", 400e-6, nu, domain, maxlines=150)
    return gas, nu, domain


def test_wellmixed_alias_scales_by_concentration(baked):
    gas, nu, domain = baked
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    np.testing.assert_allclose(
        np.asarray(gas(T, P)), 400e-6 * np.asarray(gas.raw_sigma(T, P)), rtol=1e-12
    )
    with pytest.raises(ValueError, match="well-mixed concentration"):
        WellMixedGas("x.par", 1.5, nu, domain)


def test_variable_gas_requires_callable(baked):
    _, nu, domain = baked
    with pytest.raises(TypeError, match="callable"):
        VariableGas("x.par", 0.5, nu, domain)


def test_select_slices_wavenumbers(baked):
    gas, nu, _ = baked
    sub = gas.select(np.arange(10, 20))
    assert sub.nu.shape == (10,)
    T = jnp.asarray([260.0])
    P = jnp.asarray([5e3])
    np.testing.assert_allclose(
        np.asarray(sub(T, P)), np.asarray(gas(T, P))[:, 10:20], rtol=1e-12
    )


def test_reconcentrate_swaps_closure(baked):
    gas, nu, _ = baked
    g2 = gas.reconcentrate(800e-6)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    np.testing.assert_allclose(
        np.asarray(g2(T, P)), 2.0 * np.asarray(gas(T, P)), rtol=1e-12
    )


def test_profiling_cost_model():
    from clearsky_tpu.ops.linesum import build_line_window_plan
    from clearsky_tpu.utils.profiling import linesum_cost, speed_of_light_report

    nu = np.linspace(1.0, 100.0, 512)
    nul = np.sort(np.random.default_rng(0).uniform(1.0, 100.0, 200))
    plan = build_line_window_plan(nu, nul, 25.0, block=128)
    cost = linesum_cost(plan, n_states=4)
    assert cost.flops > 0 and cost.bytes_moved > 0 and cost.evals > 0
    assert cost.flops >= cost.useful_flops
    rep = speed_of_light_report(plan, 4, seconds=0.01, chip="v5e")
    assert 0 < rep["fraction_of_roof"]
    assert rep["achieved_flops"] == pytest.approx(cost.flops / 0.01)
