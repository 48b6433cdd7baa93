"""A/B the stencil-near strategy vs the default grouped split on the TPU.

The default split kernel pays ~36% of its wall in the near sweep: dense w4
over every line within a block-span of each 128-point block, of which only
the ~2-point |x| <= 15 core per line is actually outside region-1 validity
(CO2 bench geometry: d_near = 0.24 cm^-1 vs 13.7 cm^-1 block span).
strategy="stencil" drops the near sweep entirely — region 1 rides the whole
window in-kernel and an O(L*K) XLA scatter adds Sia*(w4 - region1) at the K
grid points around each line (ops/linesum_pallas.py:_stencil_near_correction).

Configs: the voigt bench grid (131072 pts, cut=25) and an RCE-class coarse
grid (16384 pts over the full span). Prints per-call wall (K-chained,
RTT-subtracted), useful evals/s, and stencil-vs-default agreement.
"""

import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.ops.linesum import build_line_window_plan
from clearsky_tpu.ops.linesum_pallas import (
    sigma_from_lines_pallas, _stencil_width,
)
from ab_coarse import timed, _line_evals

CO2 = "/root/reference/test/HITRAN/CO2.par"
N_STATES = 16


def drive(tag, lines, nu, shape, cut, strategies=("grouped", "auto")):
    nu_l = np.asarray(lines.nu, np.float64)
    plan = build_line_window_plan(nu, nu_l, cut, block=128)
    K = _stencil_width(plan, lines)
    print(f"[{tag}] n_nu={len(nu)} evals={_line_evals(nu, nu_l, cut):.3e} "
          f"stencil_k={K}", flush=True)
    T = jnp.asarray(np.linspace(180.0, 320.0, N_STATES), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), N_STATES)),
                    jnp.float32)

    out = {"stencil_k": K}
    sigs = {}
    for strat in strategies:
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
    a, b = sigs[strategies[0]], sigs[strategies[1]]
    pk = np.abs(a).max(axis=1, keepdims=True)
    for thr in (1e-4, 1e-8):
        m = np.abs(a) > thr * pk
        rel = (np.abs(b - a) / np.maximum(np.abs(a), 1e-300))[m].max()
        out[f"max_rel_vs_default(sig>{thr:g}pk)"] = float(rel)
        print(f"[{tag}] agreement (sig>{thr:g}pk): {rel:.3e}", flush=True)
    out["speedup"] = (out[strategies[0]]["per_call_s"]
                      / out[strategies[1]]["per_call_s"])
    print(f"[{tag}] speedup {out['speedup']:.2f}x", flush=True)
    return out


def main():
    lines = SpectralLines.from_par(CO2)
    nu_l = np.asarray(lines.nu, np.float64)
    rep = {"backend": jax.default_backend()}

    # bench voigt geometry: full fixture span at the bench density
    nu_bench = np.linspace(nu_l.min() - 25.0, nu_l.max() + 25.0, 131072)
    rep["voigt_bench"] = drive("voigt-bench", lines, nu_bench, "voigt", 25.0)  # grouped (in-kernel split) vs auto (stencil-routed)

    # RCE-class coarse grid
    nu_rce = np.linspace(nu_l.min() - 25.0, nu_l.max() + 25.0, 16384)
    rep["voigt_rce"] = drive("voigt-rce", lines, nu_rce, "voigt", 25.0)

    print(json.dumps(rep))


if __name__ == "__main__":
    main()
