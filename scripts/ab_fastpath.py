"""TPU A/B: grouped line-sum kernel near/far Humlicek split vs single full-w4 sweep.

One session, one process: variant A (strategy="auto") runs the branch-free
near/far split; variant B (strategy="nosplit") runs the single full-w4 sweep
(distinct static arg -> distinct jit trace). Timing methodology is
bench.py's chained-scan with forced readback (remote-attached TPU: dispatch is
async, block_until_ready does not wait).

Run:  python scripts/ab_fastpath.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

import clearsky_tpu.ops.linesum_pallas as lp
from clearsky_tpu.ops.linesum import build_line_window_plan
from clearsky_tpu.spectra.lines import SpectralLines

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
N_NU = 131072
N_STATES = 16
N_CHAIN = 8


def line_evals(nu_grid, nu_lines, cut):
    lo = np.searchsorted(nu_lines, nu_grid - cut, side="left")
    hi = np.searchsorted(nu_lines, nu_grid + cut, side="right")
    return int(np.sum(hi - lo))


def time_variant(tag, plan, lines, Tj, Pj, Pp, shape, strategy, evals):
    @jax.jit
    def chained(T0):
        def body(Tc, _):
            s = lp.sigma_from_lines_pallas(
                plan, lines, Tc, Pj, Pp, shape, strategy=strategy
            )
            return Tc + 1e-30 * s.sum(axis=1), None

        Tn, _ = lax.scan(body, T0, None, length=N_CHAIN)
        return Tn

    t0 = time.perf_counter()
    float(chained(Tj).sum())  # compile + settle
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chained(Tj + 0.01 * i).sum())
        times.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    float((Tj + 1.0).sum())
    rtt = time.perf_counter() - t0
    per_call = max(min(times) - rtt, 1e-9) / N_CHAIN
    rate = evals / per_call
    print(f"[{tag}] {rate:.3e} useful evals/s  (times={['%.3f' % t for t in times]}, rtt={rtt*1e3:.0f}ms)", flush=True)
    return rate


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    lines = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(lines.nu)
    T = jnp.asarray(np.linspace(180.0, 320.0, N_STATES), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), N_STATES)), jnp.float32)
    Pp = 0.95 * P

    results = {}
    for shape, cut in (("voigt", 25.0), ("phco2", 500.0)):
        nu = np.linspace(nu_l.min() - cut, nu_l.max() + cut, N_NU)
        plan = build_line_window_plan(nu, nu_l, cut, block=128)
        evals = line_evals(nu, nu_l, cut) * N_STATES

        # A: near/far split (default), B: single full-w4 sweep
        sA = np.asarray(lp.sigma_from_lines_pallas(plan, lines, T, P, Pp, shape, strategy="auto"))
        rA = time_variant(f"{shape} split", plan, lines, T, P, Pp, shape, "auto", evals)
        sB = np.asarray(lp.sigma_from_lines_pallas(plan, lines, T, P, Pp, shape, strategy="nosplit"))
        rB = time_variant(f"{shape} full ", plan, lines, T, P, Pp, shape, "nosplit", evals)

        denom = np.maximum(np.abs(sB), np.abs(sB).max(axis=1, keepdims=True) * 1e-12)
        reldiff = float(np.nanmax(np.abs(sA - sB) / denom))
        print(f"[{shape}] A/B speedup {rA/rB:.2f}x, max rel diff fast-vs-full {reldiff:.2e}", flush=True)
        results[shape] = (rA, rB, reldiff)

    print(results)


if __name__ == "__main__":
    main()
