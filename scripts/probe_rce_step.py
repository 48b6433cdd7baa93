"""Probe: full RCE step throughput on TPU (the production training-step cost).

Re-measures BASELINE.md's "Full LBL RCE step incl. per-step sigma refresh"
row (round-1 config: 16384-pt spectrum, CO2+H2O fused MultiGas, 20 levels)
with the robust chained timing from bench.py — K steps scanned on device in
one jit, minus a min-of-5 relay RTT. Three numbers:

  * cached-sigma heating step (update_every=0) — the per-step floor,
  * sigma refresh alone (AcceleratedAbsorber.update chained),
  * full step incl. per-step refresh (update_every=1) — the headline.

Usage: python scripts/probe_rce_step.py [--nnu 16384] [--chain 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

PAR_DIR = "/root/reference/test/HITRAN"


def timed(fn, arg, reps=4):
    """min wall time of fn(arg) with forced readback, minus min-of-5 RTT."""
    float(np.asarray(fn(arg)).sum())  # compile + settle
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(arg + 0.01 * i)).sum())
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((arg + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    return max(min(times) - min(rtts), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnu", type=int, default=16384)
    ap.add_argument("--chain", type=int, default=32)
    args = ap.parse_args()
    K = args.chain

    import dataclasses
    from clearsky_tpu import SpectralLines, RCM, run
    from clearsky_tpu.absorption.gas import MultiGas
    from clearsky_tpu.models.rcm import heating
    from clearsky_tpu.utils.grids import pressuregrid
    from clearsky_tpu.utils.interp import interp_linear
    from clearsky_tpu.constants import R_GAS

    G, MU, CP, PS = 9.8, 0.029, 1e3, 1e5
    t0 = time.time()
    nu = np.linspace(100.0, 2200.0, args.nnu)
    mix = MultiGas.from_lines(
        [
            (SpectralLines.from_par(f"{PAR_DIR}/CO2.par"), 400e-6),
            (SpectralLines.from_par(f"{PAR_DIR}/H2O.par"), 0.01),
        ],
        nu,
    )
    n_lines = np.asarray(mix.lines.nu).shape[0]
    Pe = pressuregrid(50.0, PS, 20)
    Te = np.maximum(280.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 180.0)
    fS = lambda v: jnp.full(jnp.shape(v), 240.0 / (nu[-1] - nu[0]))
    r = RCM.create(
        Pe, Te, G, lambda T, P: MU, fS, 0.0, lambda T, P: CP, 5e5, mix
    )
    n_states = int(np.asarray(r.A.lnP).shape[0])
    print(
        f"[{time.time()-t0:6.1f}s] {args.nnu} wavenumbers, {n_lines} fused "
        f"lines, {len(Pe)} levels, {n_states} absorber states, chain K={K}",
        flush=True,
    )
    T0 = jnp.asarray(r.T)

    @jax.jit
    def cached_chain(T):
        out, _ = run(dataclasses.replace(r, T=T), dt=2e4, nsteps=K)
        return out.T

    dt_cached = timed(cached_chain, T0) / K
    print(f"cached-sigma heating step : {dt_cached*1e3:8.2f} ms/step", flush=True)

    lnPe, lnP = jnp.log(jnp.asarray(r.Pe)), jnp.log(jnp.asarray(r.P))

    @jax.jit
    def refresh_chain(T):
        def body(Tc, _):
            Te_ = interp_linear(lnPe, lnP, Tc)
            A = r.A.update(Te_)
            # fold sigma back into the carry so iterations serialize
            return Tc + 1e-30 * A.ln_sigma.sum(), None

        Tn, _ = jax.lax.scan(body, T, None, length=K)
        return Tn

    dt_refresh = timed(refresh_chain, T0) / K
    print(f"sigma refresh alone       : {dt_refresh*1e3:8.2f} ms/call", flush=True)

    @jax.jit
    def full_chain(T):
        out, _ = run(dataclasses.replace(r, T=T), dt=2e4, nsteps=K, update_every=1)
        return out.T

    dt_full = timed(full_chain, T0) / K
    print(f"full step incl. refresh   : {dt_full*1e3:8.2f} ms/step", flush=True)
    nu_l = np.asarray(mix.lines.nu)
    cut = float(mix.plan.cut)
    evals = int(
        np.sum(
            np.searchsorted(nu_l, nu + cut, side="right")
            - np.searchsorted(nu_l, nu - cut, side="left")
        )
    )
    print(
        f"refresh share {dt_refresh/dt_full*100:.0f}% | useful line-evals/s "
        f"in refresh {n_states * evals / dt_refresh:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
