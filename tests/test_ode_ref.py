"""Discretized core vs the adaptive reference ODE solver.

Demonstrates the resolution-for-adaptivity swap (SURVEY.md §7.2): the layered
linear-in-tau engine converges to the adaptive Radau-class solution as the
grid refines, on a spectrally structured (semigray) absorber where tau spans
transparent to thick across the band edge.
"""

import numpy as np
import pytest

from clearsky_tpu.absorption.gas import SemiGrayGas, GrayGas
from clearsky_tpu.absorption.absorbers import unify_absorbers
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.rt.fluxes import outgoing, optical_depth
from clearsky_tpu.rt.ode_ref import ode_outgoing, ode_optical_depth

G, MU, CP, PS, TS = 9.8, 0.029, 1e3, 1e5, 290.0


def profiles():
    fT = lambda P: np.maximum(TS * (np.asarray(P) / PS) ** (R_GAS / (MU * CP)), 150.0)
    fmu = lambda T, P: MU
    return fT, fmu


def test_outgoing_converges_to_adaptive_ode():
    nu = np.linspace(10.0, 3000.0, 40)
    gas = SemiGrayGas.create(4e-26, nu, nucut=1200.0)
    A = unify_absorbers((gas,))
    fT, fmu = profiles()
    ref = ode_outgoing(PS, G, fT, fmu, A, Ptop=1.0, nstream=5)
    for nlevels, tol in [(64, 0.04), (256, 0.01)]:
        ours = np.asarray(
            outgoing(PS, G, fT, fmu, gas, Ptop=1.0, nstream=5, nlevels=nlevels)
        )
        rel = np.abs(ours - ref) / np.abs(ref)
        assert rel.max() < tol, (nlevels, rel.max())


def test_optical_depth_converges_to_adaptive_ode():
    nu = np.linspace(10.0, 3000.0, 16)
    gas = GrayGas.create(2e-26, nu)
    A = unify_absorbers((gas,))
    fT, fmu = profiles()
    theta = 0.5
    ref = ode_optical_depth(PS, 1.0, G, fT, fmu, A, theta=theta)
    ours = np.asarray(
        optical_depth((PS, 1.0), G, fT, fmu, theta, gas, nlevels=256)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3)
