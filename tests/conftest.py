"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-device sharding tests emulate a TPU mesh on CPU via
``xla_force_host_platform_device_count`` (the standard way to validate
shardings without a pod). float64 gives reference-grade numerics for the
physics validation tests; the TPU bench path runs float32.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may have pre-imported jax with a TPU platform already
# registered (sitecustomize); the env var alone is then too late, so force
# the platform through the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

REF_FIXTURES = "/root/reference/test/HITRAN"


@pytest.fixture(scope="session")
def fixtures_dir():
    if not os.path.isdir(REF_FIXTURES):
        pytest.skip("reference HITRAN fixtures not available")
    return REF_FIXTURES


def gray_analytic_olr(sigma, G, MU, CP, PS, TS):
    """Closed-form gray-atmosphere OLR (Pierrehumbert eq. 4.32) on a dry
    adiabat — the shared analytic anchor for both flux engines' gray tests
    (ref test_gray.jl:15-24)."""
    from scipy.integrate import quad
    from clearsky_tpu.constants import R_GAS, SIGMA_SB, N_AVOGADRO

    tau_inf = 1e-4 * sigma * N_AVOGADRO / (MU * G) * PS
    gam = R_GAS / (MU * CP)
    I, _ = quad(lambda t: np.exp(-t) * t ** (4 * gam), 0, tau_inf, limit=500)
    return SIGMA_SB * TS**4 * (np.exp(-tau_inf) + tau_inf ** (-4 * gam) * I)
