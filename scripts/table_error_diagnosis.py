"""Diagnose the production-scale baked-table accuracy tail (VERDICT r3 #2).

Round 3 recorded sigma max-rel error 0.69 (over points above 1e-8 of peak)
for the f32 TPU bake at 2^19 wavenumbers, far outside the reference's stated
~1% table-error class at 12 T x 24 P nodes (ref gases.jl:7). This script
answers WHERE the tail lives and WHETHER it is intrinsic to the reference's
own table design (Chebyshev fit of ln sigma over (T, lnP), ref
gases.jl:60-97) at this resolution, or an artifact of the f32 pipeline.

phase A (``--phase tpu``, needs the chip): bake the production f32 table,
  evaluate sigma_table vs sigma_direct at the round-3 probe state
  (250 K, 1e4 Pa), and dump the worst-offending nu columns plus error
  distribution stats to ``--out`` (npz).

phase B (``--phase cpu``, float64, no chip): for the worst columns plus a
  random control set, evaluate the EXACT f64 line-sum at all 288 domain
  nodes, fit the same Chebyshev tables in f64 (the reference's own
  convention and precision), and measure the interpolation error of the f64
  tables against f64 truth on a dense (T, P) probe grid. If the f64 tables
  show the same tail, the tail is the reference design's own tradeoff at
  this nu resolution; the f32-vs-f64 split then quantifies what the f32
  pipeline adds.

Usage:
  python scripts/table_error_diagnosis.py --phase tpu --out /tmp/tail.npz
  python scripts/table_error_diagnosis.py --phase cpu --in /tmp/tail.npz
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

PAR_DIR = "/root/reference/test/HITRAN"
PT, PS = 10.0, 1e5
T_PROBE, P_PROBE = 250.0, 1e4


def build_nu(n):
    from clearsky_tpu.spectra.lines import SpectralLines

    co2 = SpectralLines.from_par(f"{PAR_DIR}/CO2.par")
    lo = float(np.asarray(co2.nu).min())
    hi = float(np.asarray(co2.nu).max())
    return co2, np.linspace(max(lo - 25.0, 1.0), hi + 25.0, n)


def phase_tpu(args):
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from clearsky_tpu.absorption.gas import DirectGas, Gas
    from clearsky_tpu.absorption.domain import AtmosphericDomain

    co2, nu = build_nu(args.nnu)
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    t0 = time.time()
    gas_t = Gas.from_lines(co2, 0.95, nu, dom)
    jax.block_until_ready(gas_t.coeffs)
    print(f"[{time.time()-t0:.1f}s] baked", flush=True)
    gas_d = DirectGas.from_lines(co2, 0.95, nu)
    Tq, Pq = jnp.asarray(T_PROBE), jnp.asarray(P_PROBE)
    st = np.asarray(gas_t.raw_sigma(Tq, Pq), dtype=np.float64)
    sd = np.asarray(gas_d.raw_sigma(Tq, Pq), dtype=np.float64)
    peak = sd.max()
    m = sd > peak * 1e-8
    rel = np.zeros_like(sd)
    rel[m] = np.abs(st - sd)[m] / sd[m]
    print(f"max rel (sig > 1e-8 peak): {rel.max():.3f} at nu="
          f"{nu[np.argmax(rel)]:.3f}", flush=True)

    # error distribution vs sigma magnitude decade
    # distance to nearest line (two-sided via searchsorted)
    lines_nu = np.sort(np.asarray(co2.nu, dtype=np.float64))
    idx = np.searchsorted(lines_nu, nu).clip(1, len(lines_nu) - 1)
    dist = np.minimum(np.abs(nu - lines_nu[idx - 1]), np.abs(nu - lines_nu[idx]))
    stats = []
    for lo_dec in range(-8, 0):
        dm = m & (sd > peak * 10.0 ** lo_dec) & (sd <= peak * 10.0 ** (lo_dec + 1))
        if dm.sum():
            stats.append({
                "decade": lo_dec, "n": int(dm.sum()),
                "max_rel": float(rel[dm].max()),
                "p99_rel": float(np.quantile(rel[dm], 0.99)),
                "med_dist_to_line": float(np.median(dist[dm])),
            })
    print(json.dumps(stats, indent=1), flush=True)

    order = np.argsort(rel)[::-1]
    worst = order[: args.nworst]
    rng = np.random.default_rng(0)
    control = rng.choice(np.flatnonzero(m), size=args.nworst, replace=False)
    np.savez(
        args.out, nu=nu, worst_idx=worst, control_idx=control,
        rel=rel[worst].astype(np.float32), sd_worst=sd[worst], st_worst=st[worst],
        peak=peak, stats=json.dumps(stats),
    )
    print(f"wrote {args.out}", flush=True)


def phase_cpu(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from clearsky_tpu.absorption.domain import AtmosphericDomain
    from clearsky_tpu.absorption.gas import _ln_sigma_coeffs
    from clearsky_tpu.ops.linesum import build_line_window_plan, sigma_from_lines
    from clearsky_tpu.utils.interp import cheb_basis

    data = np.load(args.inp)
    nu = data["nu"]
    co2, _ = build_nu(len(nu))
    sel = np.unique(np.concatenate([data["worst_idx"], data["control_idx"]]))
    nu_sel = nu[sel]
    o = np.argsort(nu_sel)
    nu_sel, sel = nu_sel[o], sel[o]
    print(f"{len(sel)} selected columns", flush=True)

    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    TT, PP = np.meshgrid(np.asarray(dom.T), np.asarray(dom.P), indexing="ij")
    plan = build_line_window_plan(nu_sel, np.asarray(co2.nu), 25.0, block=8)
    t0 = time.time()

    def sig_at(Tv, Pv):
        return np.asarray(sigma_from_lines(
            plan, co2, jnp.asarray(Tv), jnp.asarray(Pv),
            0.95 * jnp.asarray(Pv), "voigt",
        ), dtype=np.float64)

    sig_nodes = sig_at(TT.ravel(), PP.ravel()).reshape(12, 24, -1)
    print(f"[{time.time()-t0:.1f}s] f64 node sums done", flush=True)

    coeffs64 = _ln_sigma_coeffs(sig_nodes, dom)           # [288, nsel] f64 fit
    coeffs32 = coeffs64.astype(np.float32)

    # dense probe grid strictly inside the domain (the reference's
    # opacityerror protocol, ref gases.jl:152-175)
    Tp = np.linspace(dom.Tmin, dom.Tmax, args.nprobe)
    Pp = 10 ** np.linspace(np.log10(dom.Pmin), np.log10(dom.Pmax), args.nprobe)
    TTp, PPp = np.meshgrid(Tp, Pp, indexing="ij")
    truth = sig_at(TTp.ravel(), PPp.ravel())              # [nprobe^2, nsel]
    print(f"[{time.time()-t0:.1f}s] f64 probe sums done", flush=True)

    BT = np.asarray(cheb_basis(jnp.asarray(TTp.ravel()), dom.Tmin, dom.Tmax, dom.nT))
    BP = np.asarray(cheb_basis(jnp.log(jnp.asarray(PPp.ravel())),
                               np.log(dom.Pmin), np.log(dom.Pmax), dom.nP))
    basis = (BT[:, :, None] * BP[:, None, :]).reshape(len(TTp.ravel()), -1)
    approx64 = np.exp(basis @ coeffs64)
    approx32 = np.exp((basis.astype(np.float32) @ coeffs32).astype(np.float64))

    peak = float(data["peak"])
    mask = truth > peak * 1e-8
    rel64 = np.where(mask, np.abs(approx64 - truth) / np.where(mask, truth, 1.0), 0.0)
    rel32 = np.where(mask, np.abs(approx32 - truth) / np.where(mask, truth, 1.0), 0.0)

    nw = (sel[:, None] == data["worst_idx"][None, :]).any(axis=1)
    rep = {}
    for name, cols in (("worst", nw), ("control", ~nw)):
        r64, r32 = rel64[:, cols], rel32[:, cols]
        mk = mask[:, cols]
        rep[name] = {
            "n_cols": int(cols.sum()),
            "f64_table_max_rel": float(r64[mk].max()) if mk.any() else None,
            "f64_table_p99_rel": float(np.quantile(r64[mk], 0.99)) if mk.any() else None,
            "f32_fit_max_rel": float(r32[mk].max()) if mk.any() else None,
            "f32_minus_f64_max": float(np.abs(r32 - r64)[mk].max()) if mk.any() else None,
        }
    # per-column worst for scatter diagnosis
    worst_cols = np.argsort(rel64.max(axis=0))[::-1][:10]
    rep["worst_f64_columns"] = [
        {"nu": float(nu_sel[c]), "f64_max_rel": float(rel64[:, c].max()),
         "f32_max_rel": float(rel32[:, c].max()),
         "sigma_at_probe_over_peak": float(
             sig_at(np.array([T_PROBE]), np.array([P_PROBE]))[0, c] / peak)}
        for c in worst_cols
    ]
    print(json.dumps(rep, indent=1), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["tpu", "cpu"], required=True)
    ap.add_argument("--nnu", type=int, default=524288)
    ap.add_argument("--nworst", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=24)
    ap.add_argument("--out", default="/tmp/table_tail.npz")
    ap.add_argument("--in", dest="inp", default="/tmp/table_tail.npz")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    (phase_tpu if args.phase == "tpu" else phase_cpu)(args)


if __name__ == "__main__":
    main()
