"""TPU A/B: sublane line-group height (lgroup) sweep in the grouped kernel.

The grouped kernel's inner fori_loop advances ``lgroup`` lines per iteration
([lgroup, B] tile). lgroup=8 is one vreg of sublanes — finest work
quantization but one loop-control + accumulate round per 1024 evals, which
the near/far-split measurements suggest dominates. Larger groups amortize
the loop at the cost of ceil(cnt/lgroup)*lgroup dense work per window.
Timing methodology is bench.py's chained-scan with forced readback.

Run:  python scripts/ab_lgroup.py
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
# the grouped kernel is now fast enough that an 8-call chain (~30 ms) is
# comparable to the relay RTT jitter (+-30 ms) — chain 64 calls so the
# on-device work dominates the measurement
N_CHAIN = 64


def line_evals(nu_grid, nu_lines, cut):
    lo = np.searchsorted(nu_lines, nu_grid - cut, side="left")
    hi = np.searchsorted(nu_lines, nu_grid + cut, side="right")
    return int(np.sum(hi - lo))


def time_variant(tag, plan, lines, Tj, Pj, Pp, shape, lgroup, evals):
    @jax.jit
    def chained(T0):
        def body(Tc, _):
            s = lp.sigma_from_lines_pallas(
                plan, lines, Tc, Pj, Pp, shape, lgroup=lgroup
            )
            return Tc + 1e-30 * s.sum(axis=1), None

        Tn, _ = lax.scan(body, T0, None, length=N_CHAIN)
        return Tn

    t0 = time.perf_counter()
    float(chained(Tj).sum())  # compile + settle
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        float(chained(Tj + 0.01 * i).sum())
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((Tj + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
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
    for shape, cut, groups in (
        ("voigt", 25.0, (8, 16, 32, 64)),
        ("phco2", 500.0, (8, 32)),
    ):
        nu = np.linspace(nu_l.min() - cut, nu_l.max() + cut, N_NU)
        plan = build_line_window_plan(nu, nu_l, cut, block=128)
        evals = line_evals(nu, nu_l, cut) * N_STATES

        ref = None
        for lg in groups:
            s = np.asarray(
                lp.sigma_from_lines_pallas(plan, lines, T, P, Pp, shape, lgroup=lg)
            )
            if ref is None:
                ref = s
            else:
                denom = np.maximum(np.abs(ref), np.abs(ref).max(axis=1, keepdims=True) * 1e-12)
                print(f"[{shape} lg={lg}] max rel diff vs lg=8: {np.nanmax(np.abs(s - ref) / denom):.2e}", flush=True)
            r = time_variant(f"{shape} lg={lg}", plan, lines, T, P, Pp, shape, lg, evals)
            results[(shape, lg)] = r

    for k, v in sorted(results.items()):
        print(f"{k}: {v:.3e}")


if __name__ == "__main__":
    main()
