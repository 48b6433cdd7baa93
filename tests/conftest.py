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
