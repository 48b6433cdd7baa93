"""A/B: resident-VMEM budget sweep for the segmented line-sum.

The 6 MiB residency budget was set conservatively in round 1 (leave room for
output blocks + pipeline buffers). With catalog segmentation the budget now
also sets the segment count for large catalogs — a larger budget means fewer,
longer segments (less launch overhead, better group-loop amortization) as
long as Mosaic still allocates. This sweeps the budget on the synthetic
56k-line catalog from ab_segmented.py; a failed allocation shows up as a
compile error and is reported, not fatal.

Usage: python scripts/ab_vmem_limit.py [--copies 10] [--nnu 131072]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from ab_segmented import big_catalog, timed_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--nnu", type=int, default=131072)
    args = ap.parse_args()

    from clearsky_tpu.ops import linesum_pallas as lp
    from clearsky_tpu.ops.linesum import build_line_window_plan

    t0 = time.time()
    lines, nu_l = big_catalog(args.copies)
    nu = np.linspace(nu_l.min() - 25.0, nu_l.max() + 25.0, args.nnu)
    plan = build_line_window_plan(nu, nu_l, 25.0, block=128)
    n_states = 16
    T = jnp.asarray(np.linspace(180.0, 320.0, n_states), jnp.float32)
    P = jnp.asarray(np.geomspace(10.0, 1e5, n_states), jnp.float32)
    Pp = 0.95 * P
    lo = np.searchsorted(nu_l, nu - 25.0)
    hi = np.searchsorted(nu_l, nu + 25.0)
    evals = int(np.sum(hi - lo)) * n_states
    print(
        f"[{time.time()-t0:5.1f}s] {len(nu_l)} lines, {args.nnu} pts, "
        f"{n_states} states, {evals:.3g} useful evals/call",
        flush=True,
    )

    for mib in (6, 12, 24, 48):
        limit = mib * 2**20
        cap = lp._segment_cap("voigt", "auto", n_states, limit, plan.slab)
        n_seg = -(-len(nu_l) // cap) if cap else 0
        fn = lambda Tc, Pj, Pq, l=limit: lp.sigma_from_lines_pallas(
            plan, lines, Tc, Pj, Pq, "voigt", resident_limit=l
        )
        try:
            dt = timed_chain(fn, T, P, Pp)
        except Exception as e:  # VMEM overflow etc: report and continue
            print(f"limit {mib:3d} MiB ({n_seg} segments): FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(
            f"limit {mib:3d} MiB ({n_seg:2d} segments of <= {cap}): "
            f"{dt*1e3:8.2f} ms/call  {evals/dt:.3e} useful evals/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
