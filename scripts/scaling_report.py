"""Scaling report: sharded RCE heating across virtual device counts.

Measures the shard_map heating program on 1..N virtual CPU devices to
demonstrate the spectral-sharding mechanism (BASELINE north-star metric #2 is
defined on real multi-chip hardware; virtual CPU devices share host cores, so
the numbers here validate the mechanism and the collective structure, not
absolute scaling efficiency).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_report.py
"""

import os
import sys
import time

sys.path.insert(0, ".")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
# float64 for the cross-shard-count consistency check: in float32 the
# top-of-atmosphere heating (a small difference of large fluxes) amplifies
# rounding noise to percent level, masking any real sharding error
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def main():
    from clearsky_tpu import GrayGas, RCM
    from clearsky_tpu.models import rcm as rcm_mod
    from clearsky_tpu.parallel import spectral_mesh, make_sharded_heating
    from clearsky_tpu.utils.grids import pressuregrid
    from clearsky_tpu.constants import R_GAS

    G, MU, CP, PS = 9.8, 0.029, 1e3, 1e5
    n_nu = 32768
    nu = np.linspace(1.0, 3000.0, n_nu)
    gas = GrayGas.create(5e-27, nu)
    Pe = pressuregrid(10.0, PS, 24)
    Te = np.maximum(280.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 150.0)
    r = RCM.create(Pe, Te, G, lambda T, P: MU, 0.0, 0.0, lambda T, P: CP, 1e7, gas)

    devices = jax.devices()
    print(f"{len(devices)} virtual devices, n_nu={n_nu}")
    H_ref = None
    base = None
    for k in [1, 2, 4, 8]:
        if k > len(devices):
            break
        mesh = spectral_mesh(n_nu_shards=k, devices=devices[:k])
        hfn = make_sharded_heating(mesh, r)
        H = np.asarray(hfn(r.T))  # compile
        if H_ref is None:
            H_ref = H
        else:
            np.testing.assert_allclose(H, H_ref, rtol=1e-9)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(hfn(r.T))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        if base is None:
            base = dt
        print(
            f"  nu-shards={k}: {dt*1e3:7.2f} ms/heating  "
            f"speedup {base/dt:4.2f}x  (physics identical to 1e-9)"
        )


if __name__ == "__main__":
    main()
