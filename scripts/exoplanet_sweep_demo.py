"""Demo: latitude x insolation RCE sweep on a device mesh (BASELINE config 5).

Computes annual-mean insolation factors across latitudes for an elliptical
orbit, then integrates a batch of RCE columns — all latitudes at once,
sharded over a ('batch', 'nu') mesh — and prints the equilibrium
surface-temperature profile by latitude.

Usage: python scripts/exoplanet_sweep_demo.py [--nlat N] [--steps N]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlat", type=int, default=8)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--nnu", type=int, default=512)
    ap.add_argument("--ecc", type=float, default=0.0167)
    ap.add_argument("--obliquity", type=float, default=0.41)
    args = ap.parse_args()

    from clearsky_tpu import GrayGas, RCM, annualfluxfactors
    from clearsky_tpu.models.sweep import run_sweep, shard_sweep
    from clearsky_tpu.parallel import spectral_mesh
    from clearsky_tpu.utils.grids import pressuregrid, logrange
    from clearsky_tpu.constants import R_GAS

    G, MU, CP, PS = 9.8, 0.029, 1e3, 1e5
    t0 = time.time()

    theta, F = annualfluxfactors(args.ecc, args.obliquity, 0.0, ntheta=args.nlat)
    factors = 4.0 * jnp.asarray(F)  # normalize so the global mean factor is ~1

    nu = np.concatenate([logrange(1e-6, 1e4, args.nnu - 1, 3), [1e5]])
    gas = GrayGas.create(4e-27, nu)
    Pe = pressuregrid(10.0, PS, 16)
    Te = np.maximum(255.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 150.0)
    S0 = 340.0 / np.cos(0.841)
    # normalize the flat stellar spectrum by the ACTUAL grid span so its
    # trapz integral is S0 (the appended 1e5 tail point is 90% of the span)
    fS = lambda v: jnp.full(jnp.shape(v), S0 / (nu[-1] - nu[0]))
    r = RCM.create(Pe, Te, G, lambda T, P: MU, fS, 0.1, lambda T, P: CP, 1e6, gas)

    n_dev = len(jax.devices())
    n_batch = 2 if (n_dev % 2 == 0 and n_dev > 1 and args.nlat % 2 == 0) else 1
    mesh = spectral_mesh(n_batch=n_batch)
    r_s, f_s, T_s = shard_sweep(mesh, r, factors)
    print(f"[{time.time()-t0:5.1f}s] mesh {dict(mesh.shape)}, "
          f"{args.nlat} latitude columns x {len(nu)} wavenumbers")

    T_b, _ = jax.jit(
        lambda rr, ff, tt: run_sweep(rr, ff, 2e4, args.steps, T0_b=tt,
                                     adjust_every=1, cp=CP, mu=MU)
    )(r_s, f_s, T_s)
    T_b = np.asarray(jax.block_until_ready(T_b))
    print(f"[{time.time()-t0:5.1f}s] {args.steps} steps x {args.nlat} columns")
    print("  latitude [deg]   forcing factor   surface T [K]")
    for th, f, Ts in zip(np.asarray(theta), np.asarray(factors), T_b[:, -1]):
        # the printed factor is the one the column was actually driven with
        print(f"    {np.degrees(th):8.1f}       {float(f):8.4f}      {Ts:8.2f}")


if __name__ == "__main__":
    main()
