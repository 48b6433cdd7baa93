"""A/B: catalog-segmented grouped kernel vs the XLA-gathered fallback.

Builds a full-HITRAN-scale synthetic catalog (the CO2 fixture replicated K
times at increasing wavenumber offsets — realistic per-block line densities,
~K*5599 lines) that exceeds the resident-VMEM budget, and times the line-sum
with strategy='auto' (catalog segmentation, the new large-catalog path)
against strategy='gathered' (the old fallback whose slab gathers cost ~75%
of wall clock). Robust chained timing per bench.py.

Usage: python scripts/ab_segmented.py [--copies 10] [--nnu 131072]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
N_CHAIN = 16


def big_catalog(copies: int):
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.ops.linesum_pallas import _PER_LINE_FIELDS

    base = SpectralLines.from_par(CO2_PAR)
    nu0 = np.asarray(base.nu, np.float64)
    span = nu0.max() - nu0.min() + 50.0
    fields = {}
    for f in _PER_LINE_FIELDS:
        x = np.asarray(getattr(base, f))
        fields[f] = np.concatenate([x] * copies)
    nu64 = np.concatenate([nu0 + k * span for k in range(copies)])
    nu_hi = nu64.astype(np.float32)
    fields["nu"] = jnp.asarray(nu_hi)
    fields["nu_lo"] = jnp.asarray((nu64 - nu_hi.astype(np.float64)).astype(np.float32))
    fields = {k: jnp.asarray(v) for k, v in fields.items()}
    return dataclasses.replace(base, **fields), nu64


def timed_chain(fn, T0, Pj, Pp):
    @jax.jit
    def chained(T):
        def body(Tc, _):
            s = fn(Tc, Pj, Pp)
            return Tc + 1e-30 * s.sum(axis=1), None

        Tn, _ = lax.scan(body, T, None, length=N_CHAIN)
        return Tn

    float(chained(T0).sum())  # compile + settle
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chained(T0 + 0.01 * i).sum())
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((T0 + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    return max(min(times) - min(rtts), 1e-9) / N_CHAIN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--nnu", type=int, default=131072)
    ap.add_argument("--interpret", action="store_true", help="CPU smoke test")
    args = ap.parse_args()

    from clearsky_tpu.ops.linesum import build_line_window_plan
    from clearsky_tpu.ops.linesum_pallas import (
        sigma_from_lines_pallas, _grouped_lane_cost, _resident_bytes_est,
        _segment_cap, _RESIDENT_VMEM_LIMIT,
    )

    t0 = time.time()
    lines, nu_l = big_catalog(args.copies)
    nu = np.linspace(nu_l.min() - 25.0, nu_l.max() + 25.0, args.nnu)
    plan = build_line_window_plan(nu, nu_l, 25.0, block=128)
    n_states = 16
    T = jnp.asarray(np.linspace(180.0, 320.0, n_states), jnp.float32)
    P = jnp.asarray(np.geomspace(10.0, 1e5, n_states), jnp.float32)
    Pp = 0.95 * P
    lane_cost = _grouped_lane_cost("voigt", "auto", n_states)
    need = _resident_bytes_est(len(nu_l), plan.slab, lane_cost)
    cap = _segment_cap("voigt", "auto", n_states, _RESIDENT_VMEM_LIMIT, plan.slab)
    lo = np.searchsorted(nu_l, nu - 25.0)
    hi = np.searchsorted(nu_l, nu + 25.0)
    evals = int(np.sum(hi - lo)) * n_states
    n_seg = -(-len(nu_l) // cap) if cap else 0
    print(
        f"[{time.time()-t0:5.1f}s] {len(nu_l)} lines, {args.nnu} pts, "
        f"{n_states} states | resident need {need/2**20:.1f} MiB "
        f"(budget {_RESIDENT_VMEM_LIMIT/2**20:.0f}) -> {n_seg} segments of "
        f"<= {cap} lines | {evals:.3g} useful evals/call",
        flush=True,
    )
    assert need > _RESIDENT_VMEM_LIMIT, "catalog too small for the A/B"

    for strat in ("auto", "gathered"):
        fn = lambda Tc, Pj, Pq, s=strat: sigma_from_lines_pallas(
            plan, lines, Tc, Pj, Pq, "voigt", strategy=s,
            interpret=args.interpret,
        )
        dt = timed_chain(fn, T, P, Pp)
        print(
            f"strategy={strat:9s}: {dt*1e3:8.2f} ms/call  "
            f"{evals/dt:.3e} useful evals/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
