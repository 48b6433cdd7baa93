"""Checkpoint round-trips: baked Gas tables and RCM state snapshots."""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu.absorption.domain import AtmosphericDomain
from clearsky_tpu.absorption.gas import Gas, GrayGas
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.models import rcm as rcm_mod
from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.utils.checkpoint import (
    save_gas,
    load_gas,
    save_rcm_state,
    load_rcm_state,
)
from clearsky_tpu.utils.grids import pressuregrid


def test_gas_roundtrip(fixtures_dir, tmp_path):
    lines = SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=150)
    nu = np.linspace(640.0, 680.0, 64)
    domain = AtmosphericDomain.create((150.0, 350.0), 6, (10.0, 1e5), 8)
    gas = Gas.from_lines(lines, 0.5, nu, domain)
    path = str(tmp_path / "co2.npz")
    save_gas(path, gas)
    gas2 = load_gas(path, fC=0.5)
    assert gas2.name == gas.name and gas2.formula == gas.formula
    assert abs(gas2.mu - gas.mu) < 1e-15
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([1e3, 5e4])
    np.testing.assert_allclose(
        np.asarray(gas2(T, P)), np.asarray(gas(T, P)), rtol=1e-12
    )


def test_load_gas_rejects_other_npz(tmp_path):
    path = str(tmp_path / "junk.npz")
    np.savez(path, manifest=np.frombuffer(b'{"format":"x"}', dtype=np.uint8))
    with pytest.raises(ValueError, match="not a clearsky-tpu gas checkpoint"):
        load_gas(path)


def _make_rcm():
    nu = np.linspace(1.0, 2000.0, 128)
    gas = GrayGas.create(5e-27, nu)
    Pe = pressuregrid(10.0, 1e5, 12)
    Te = np.maximum(280.0 * (Pe / 1e5) ** (R_GAS / (0.029 * 1e3)), 150.0)
    return rcm_mod.RCM.create(
        Pe, Te, 9.8, lambda T, P: 0.029, 0.0, 0.0, lambda T, P: 1e3, 1e7, gas
    )


def test_rcm_state_roundtrip(tmp_path):
    r = _make_rcm()
    nu = np.asarray(r.nu)
    gas = r.A.stack.gases[0]
    r2 = rcm_mod.step(r, 600.0)
    path = str(tmp_path / "rce.npz")
    save_rcm_state(path, r2)
    r3 = load_rcm_state(path, r)
    np.testing.assert_allclose(np.asarray(r3.T), np.asarray(r2.T), rtol=0)
    np.testing.assert_allclose(
        np.asarray(r3.A.ln_sigma), np.asarray(r2.A.ln_sigma), rtol=0
    )
    # grid mismatch is rejected
    r_bad = rcm_mod.RCM.create(
        pressuregrid(10.0, 1e5, 13),
        np.full(13, 250.0),
        9.8, lambda T, P: 0.029, 0.0, 0.0, lambda T, P: 1e3, 1e7, gas,
    )
    with pytest.raises(ValueError, match="does not match"):
        load_rcm_state(path, r_bad)


def test_orbax_rcm_roundtrip(tmp_path):
    """Orbax backend: sharding-aware RCE state snapshot + skeleton restore."""
    import dataclasses
    import jax.numpy as jnp
    from clearsky_tpu.utils.checkpoint import save_rcm_orbax, load_rcm_orbax

    r = _make_rcm()
    r2 = dataclasses.replace(r, T=r.T * 1.05)
    path = str(tmp_path / "rce_ckpt")
    save_rcm_orbax(path, r2)
    r3 = load_rcm_orbax(path, r)
    np.testing.assert_allclose(np.asarray(r3.T), np.asarray(r2.T), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(r3.A.ln_sigma), np.asarray(r2.A.ln_sigma), rtol=1e-12
    )
