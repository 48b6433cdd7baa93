"""Micro A/B: march scan unroll factor on TPU (VERDICT r3 #4's targeted
layout experiment, second leg).

The march carry ([nstream, n_nu] ~ 10.5 MB at 2^19) round-trips HBM on every
scan iteration; with a static layer count the loop can be partially or fully
unrolled so XLA fuses consecutive layers and the carry stays in registers/
VMEM. This times outgoing_flux and monoflux at production scale for a sweep
of unroll factors by monkeypatching rt.discretized._UNROLL (read at trace
time) and re-jitting.

Usage: python scripts/march_unroll_ab.py [--nnu 524288] [--nlev 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnu", type=int, default=524288)
    ap.add_argument("--nlev", type=int, default=20)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.nnu, args.nlev = 4096, 12

    import jax
    import jax.numpy as jnp
    from jax import lax
    import clearsky_tpu.rt.discretized as disc

    N, nlev = args.nnu, args.nlev
    nlay = nlev - 1
    rng = np.random.default_rng(0)
    tau = jnp.asarray(rng.exponential(0.3, (nlay, N)).astype(np.float32))
    B = jnp.asarray((1.0 + rng.random((nlev, N))).astype(np.float32))
    nu = jnp.asarray(np.linspace(1.0, 2500.0, N).astype(np.float32))
    S = jnp.full((N,), 1.0, dtype=jnp.float32)
    a = jnp.full((N,), 0.1, dtype=jnp.float32)
    x0 = jnp.asarray(0.0, dtype=jnp.float32)

    def timed(fn, K, reps=3):
        @jax.jit
        def chained(x):
            def body(c, _):
                return c + 1e-30 * fn(c).sum(), None

            c, _ = lax.scan(body, x, None, length=K)
            return c

        float(np.asarray(chained(x0)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(chained(x0 + 0.01 * i)))
            ts.append(time.perf_counter() - t0)
        rtts = []
        for i in range(5):
            t0 = time.perf_counter()
            float((x0 + 1.0 + i).sum())
            rtts.append(time.perf_counter() - t0)
        return max(min(ts) - min(rtts), 1e-9) / K

    ref_out = ref_mono = None
    # two interleaved passes: the relay's throughput drifts over minutes, so
    # a sequential sweep confounds drift with the unroll effect
    disc._USE_MARCH_KERNEL = False  # this A/B measures the XLA scan;
    # without the pin the TPU dispatcher would route every 'unroll'
    # configuration to the Pallas kernel and measure the same thing
    for u in (1, 2, 4, 8, nlay, 1, 2, 4, 8, nlay):
        disc._UNROLL = u
        f_out = lambda c: disc.outgoing_flux(tau * (1.0 + 1e-30 * c), B, 5)
        def f_mono(c):
            up, dn = disc.monoflux(tau * (1.0 + 1e-30 * c), B, nu, S, a,
                                   0.841, 5)
            return up.sum(axis=0) + dn.sum(axis=0)

        dt_o = timed(f_out, 96)
        dt_m = timed(f_mono, 48)
        o = np.asarray(disc.outgoing_flux(tau, B, 5))
        mu_, md_ = disc.monoflux(tau, B, nu, S, a, 0.841, 5)
        mv = np.asarray(mu_).sum() + np.asarray(md_).sum()
        if ref_out is None:
            ref_out, ref_mono = o, mv
        dmax = np.abs(o - ref_out).max() / np.abs(ref_out).max()
        dm = abs(mv - ref_mono) / abs(ref_mono)
        print(f"unroll {u:2d}: outgoing {dt_o*1e3:7.3f} ms  mono {dt_m*1e3:7.3f} ms"
              f"   drift vs u=1: {dmax:.2e} / {dm:.2e}", flush=True)


if __name__ == "__main__":
    main()
