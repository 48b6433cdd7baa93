"""Capture REAL hardware profiles of the hot kernels (VERDICT r3 #4).

Round 3's issue-bound diagnosis of the line-sum kernel rested on analytic
cycle accounting; `utils.profiling.trace` had never been invoked. This
script proves the axon relay DOES produce full per-op device traces
(XLA Ops lane with fusion durations) and uses them:

  * traces the auto-routed voigt line-sum kernel (bench config) and the
    fused Pallas march kernel + the end-to-end table OLR core;
  * parses the Chrome-trace artifact and prints per-op time tables
    (name, calls, total us, mean us) for the device lanes;
  * prints each kernel's share of device time so the analytic cost model
    can be checked against hardware-reported durations.

Usage: python scripts/tpu_trace_capture.py [--out /tmp/clearsky_trace]
"""

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import numpy as np

PAR = "/root/reference/test/HITRAN/CO2.par"


def parse_device_ops(logdir):
    """Aggregate per-op durations from the newest trace.json.gz in logdir."""
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.loads(gzip.open(paths[-1]).read())
    ev = d["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e["name"] == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
            elif e["name"] == "thread_name":
                tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]
    dev = {p for p, n in pnames.items() if "TPU" in n}
    agg = defaultdict(lambda: [0, 0.0])
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") in dev
                and tnames.get((e["pid"], e.get("tid"))) == "XLA Ops"):
            a = agg[e["name"]]
            a[0] += 1
            a[1] += e.get("dur", 0.0)
    return dict(agg)


def report(agg, title, top=14):
    total = sum(v[1] for v in agg.values())
    print(f"\n== {title}: {total/1e3:.3f} ms total device-op time ==")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]
    for name, (n, us) in rows:
        print(f"  {us/1e3:9.3f} ms  {n:5d}x  {us/max(n,1):8.2f} us/call  "
              f"{100*us/max(total,1e-9):5.1f}%  {name[:70]}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/clearsky_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.ops.linesum import build_line_window_plan
    from clearsky_tpu.ops.linesum_pallas import sigma_from_lines_pallas
    from clearsky_tpu.utils.profiling import trace

    assert jax.default_backend() == "tpu", "trace capture needs the chip"

    # --- 1: the line-sum kernel, bench config (auto-routed = stencil) ---
    lines = SpectralLines.from_par(PAR)
    nu_l = np.asarray(lines.nu)
    nu = np.linspace(nu_l.min() - 25.0, nu_l.max() + 25.0, 131072)
    plan = build_line_window_plan(nu, nu_l, 25.0, block=128)
    T = jnp.asarray(np.linspace(180.0, 320.0, 16), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), 16)),
                    jnp.float32)

    @jax.jit
    def ksum(T0):
        def body(Tc, _):
            s = sigma_from_lines_pallas(plan, lines, Tc, P, 0.95 * P, "voigt")
            return Tc + 1e-30 * s.sum(axis=1), None

        return lax.scan(body, T0, None, length=8)[0]

    float(ksum(T).sum())  # compile outside the trace
    with trace(f"{args.out}/linesum"):
        for i in range(2):
            float(ksum(T + 0.01 * i).sum())
    agg = parse_device_ops(f"{args.out}/linesum")
    report(agg, "voigt line-sum kernel (16 calls total)")

    # --- 2: e2e table OLR core at 2^19 (march kernel + table eval) ---
    from clearsky_tpu.absorption.gas import Gas
    from clearsky_tpu.absorption.domain import AtmosphericDomain
    from clearsky_tpu.absorption.absorbers import unify_absorbers
    from clearsky_tpu.constants import R_GAS
    from clearsky_tpu.utils.grids import pressuregrid
    from clearsky_tpu.utils.interp import interp_linear
    from clearsky_tpu.rt.fluxes import _column_tau, _planck_levels
    from clearsky_tpu.rt.discretized import outgoing_flux

    G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0
    nu2 = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, 524288)
    Pe = pressuregrid(PT, PS, 20)
    Te = np.maximum(288.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe, Tj, Pg = jnp.log(jnp.asarray(Pe)), jnp.asarray(Te), jnp.asarray(Pe)
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    A = unify_absorbers((Gas.from_lines(lines, 0.95, nu2, dom),))

    @jax.jit
    def olr_chain(s, A):
        def body(c, _):
            fTs = lambda Pq: interp_linear(jnp.log(Pq), lnPe, Tj + 1e-12 * c)
            tau = _column_tau(Pg, G, fTs, lambda T_, P_: MU, A, 3)
            B = _planck_levels(Pg, A.nu, fTs)
            return c + 1e-30 * outgoing_flux(tau, B, 5).sum(), None

        return lax.scan(body, s, None, length=4)[0]

    x0 = jnp.asarray(0.0)
    float(np.asarray(olr_chain(x0, A)))
    with trace(f"{args.out}/olr"):
        for i in range(2):
            float(np.asarray(olr_chain(x0 + 0.01 * i, A)))
    agg2 = parse_device_ops(f"{args.out}/olr")
    report(agg2, "e2e table OLR core at 2^19 (8 calls total)")


if __name__ == "__main__":
    main()
