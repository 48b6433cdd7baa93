"""User-supplied sigma(nu, T, P) callables in the absorber stack.

The reference accepts raw cross-section functions alongside gases and CIA
(ref absorbers.jl:84-95 sigma chain); here they trace into the jit graph.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu.absorption.gas import GrayGas
from clearsky_tpu.absorption.absorbers import unify_absorbers
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.rt.fluxes import outgoing
from clearsky_tpu.utils.grids import trapz


def test_callable_absorber_adds_opacity():
    nu = np.linspace(1.0, 2000.0, 256)
    gas = GrayGas.create(1e-28, nu)

    def extra(nu_arr, T, P):
        # pressure-scaled continuum, active below 600 cm^-1
        band = jnp.where(jnp.asarray(nu_arr) < 600.0, 1e-26, 0.0)
        return band * (P / 1e5)

    A_gas = unify_absorbers((gas,))
    A_full = unify_absorbers((gas, extra))
    T = jnp.asarray([260.0])
    P = jnp.asarray([1e5])
    s1 = np.asarray(A_gas.sigma(T, P))[0]
    s2 = np.asarray(A_full.sigma(T, P))[0]
    lo = nu < 600.0
    np.testing.assert_allclose(s2[lo] - s1[lo], 1e-26, rtol=1e-10)
    np.testing.assert_allclose(s2[~lo], s1[~lo], rtol=0)

    fT = lambda P_: jnp.maximum(280.0 * (jnp.asarray(P_) / 1e5) ** (R_GAS / 29.0), 150.0)
    olr1 = float(trapz(nu, outgoing(1e5, 9.8, fT, lambda T_, P_: 0.029, gas, Ptop=1.0, nlevels=48)))
    olr2 = float(trapz(nu, outgoing(1e5, 9.8, fT, lambda T_, P_: 0.029, gas, extra, Ptop=1.0, nlevels=48)))
    assert olr2 < olr1


def test_non_callable_absorber_rejected():
    nu = np.linspace(1.0, 100.0, 16)
    gas = GrayGas.create(1e-28, nu)
    with pytest.raises(TypeError, match="callable"):
        unify_absorbers((gas, 3.14))


def test_no_gas_rejected():
    with pytest.raises(ValueError, match="at least one gas"):
        unify_absorbers((lambda nu, T, P: 0.0,))
