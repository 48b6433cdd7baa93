"""A/B the coarse-grid far-field strategy vs the default grouped kernel on
the real TPU.

Workloads where the static sizing (linesum_pallas._coarse_far_params)
accepts the split:
  * voigt, physically-resolved dense grid (2^18 points over the CO2 nu3
    band, ~8e-4 cm^-1 spacing — the regime where every in-window pair of
    the one-pass kernel sits far from its line)
  * phco2 at the bench grid (cut=500: the far zone is ~98% of the window)

Prints per-call wall (K-chained, RTT-subtracted), useful line-evals/s, and
coarse-vs-default max rel agreement (sigma >= 1e-4 peak).
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.ops.linesum import build_line_window_plan
from clearsky_tpu.ops.linesum_pallas import (
    sigma_from_lines_pallas, _coarse_far_params,
)

CO2 = "/root/reference/test/HITRAN/CO2.par"
N_STATES = 16


def _line_evals(nu_grid, nu_lines, cut):
    lo = np.searchsorted(nu_lines, nu_grid - cut, side="left")
    hi = np.searchsorted(nu_lines, nu_grid + cut, side="right")
    return int(np.sum(hi - lo))


def timed(fn, K=32, reps=3):
    @jax.jit
    def chained(x):
        def body(c, _):
            y = fn(c)
            return c + 1e-30 * y.sum(), None
        c, _ = lax.scan(body, x, None, length=K)
        return c

    x0 = jnp.asarray(0.0)
    float(np.asarray(chained(x0)))  # compile + settle
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(chained(x0 + 0.01 * i)))
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(np.asarray(jnp.asarray(i * 1.0) + 1.0))
        rtts.append(time.perf_counter() - t0)
    return (min(times) - min(rtts)) / K


def drive(tag, lines, nu, shape, cut):
    nu_l = np.asarray(lines.nu, np.float64)
    plan = build_line_window_plan(nu, nu_l, cut, block=128)
    params = _coarse_far_params(plan)
    print(f"[{tag}] n_nu={len(nu)} evals={_line_evals(nu, nu_l, cut):.3e} "
          f"coarse params={params}", flush=True)
    T = jnp.asarray(np.linspace(180.0, 320.0, N_STATES), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), N_STATES)),
                    jnp.float32)

    out = {}
    sigs = {}
    for strat in ("auto", "coarse"):
        f = lambda s, _strat=strat: sigma_from_lines_pallas(
            plan, lines, T + s, P, 0.5 * P, shape, strategy=_strat)
        t = timed(f)
        sigs[strat] = np.asarray(
            sigma_from_lines_pallas(plan, lines, T, P, 0.5 * P, shape,
                                    strategy=strat))
        evals = _line_evals(nu, nu_l, cut) * N_STATES
        out[strat] = dict(per_call_s=t, evals_per_s=evals / t)
        print(f"[{tag}] {strat}: {t*1e3:.3f} ms/call, "
              f"{evals/t:.3e} evals/s", flush=True)
    a, b = sigs["auto"], sigs["coarse"]
    pk = np.abs(a).max(axis=1, keepdims=True)
    m = np.abs(a) > 1e-4 * pk
    rel = (np.abs(b - a) / np.maximum(np.abs(a), 1e-300))[m].max()
    out["max_rel_vs_default(sig>1e-4pk)"] = float(rel)
    out["speedup"] = out["auto"]["per_call_s"] / out["coarse"]["per_call_s"]
    print(f"[{tag}] agreement {rel:.3e}, speedup {out['speedup']:.2f}x",
          flush=True)
    return out


def drive_sharded(tag, lines, nu, shape, n_shards):
    """nu-sharded device-plan path (single chip, shard loop) coarse vs auto."""
    from clearsky_tpu.absorption.gas import DirectGas
    from clearsky_tpu.absorption.sharded import shard_line_gas
    import dataclasses

    T = jnp.asarray(np.linspace(180.0, 320.0, N_STATES), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), N_STATES)),
                    jnp.float32)
    gas = DirectGas.from_lines(lines, 0.9, nu, shape=shape)
    sg = shard_line_gas(gas, n_shards)
    print(f"[{tag}] coarse_meta={sg.plans.coarse_meta}", flush=True)
    out = {}
    sigs = {}
    for strat in ("auto", "coarse"):
        g = dataclasses.replace(sg, strategy=strat)
        t = timed(lambda s, _g=g: _g.raw_sigma(T + s, P))
        sigs[strat] = np.asarray(g.raw_sigma(T, P))
        out[strat] = dict(per_call_s=t)
        print(f"[{tag}] {strat}: {t*1e3:.3f} ms/call", flush=True)
    a, b = sigs["auto"], sigs["coarse"]
    pk = np.abs(a).max(axis=1, keepdims=True)
    m = np.abs(a) > 1e-4 * pk
    out["max_rel_vs_default(sig>1e-4pk)"] = float(
        (np.abs(b - a) / np.maximum(np.abs(a), 1e-300))[m].max())
    out["speedup"] = out["auto"]["per_call_s"] / out["coarse"]["per_call_s"]
    print(f"[{tag}] agreement {out['max_rel_vs_default(sig>1e-4pk)']:.3e}, "
          f"speedup {out['speedup']:.2f}x", flush=True)
    return out


def main():
    lines = SpectralLines.from_par(CO2)
    rep = {"backend": jax.default_backend()}
    nu_dense = np.linspace(2200.0, 2400.0, 262144)
    rep["voigt_dense"] = drive("voigt dense 2^18", lines, nu_dense, "voigt", 25.0)
    nu_l = np.asarray(lines.nu, np.float64)
    nu_bench = np.linspace(nu_l.min() - 25.0, nu_l.max() + 25.0, 131072)
    rep["phco2_bench"] = drive("phco2 bench", lines, nu_bench, "phco2", 500.0)
    rep["voigt_dense_sharded4"] = drive_sharded(
        "voigt dense sharded x4", lines, nu_dense, "voigt", 4)
    print(json.dumps(rep, indent=1, default=float))


if __name__ == "__main__":
    main()
