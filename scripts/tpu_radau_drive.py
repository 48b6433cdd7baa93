"""Drive the adaptive Radau core on the TPU (judge item: the on-device
adaptive engine had only ever executed on f64 CPU).

Two phases (the JAX platform is per-process):

    python scripts/tpu_radau_drive.py cpu   # f64 CPU reference -> .cache_radau_cpu.npz
    python scripts/tpu_radau_drive.py tpu   # f32 TPU run, compares vs the npz

Measures, on the CO2 fixture column (DirectGas -> AcceleratedAbsorber cache):
  * RCM heating with ``core=Radau()`` (the adaptive engine, ref
    core/radau.jl:76-271) vs ``core=Discretized()`` on the same state;
  * adaptive OLR (``radau_outgoing``) vs the discretized ``outgoing``;
  * per-lane accepted-step statistics of the while_loop (the step-count
    divergence across 5 x n_nu lanes that was untested on hardware);
  * wall time per heating call (chained on-device, relay RTT subtracted).
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
CACHE = os.path.join(ROOT, ".cache_radau_cpu.npz")

N_NU = 2048
N_LEV = 20
MAXLINES = 1000
G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0
TOL = 1e-5
NSTREAM = 5


def build_rcm(core):
    from clearsky_tpu.constants import R_GAS
    from clearsky_tpu.absorption.gas import DirectGas
    from clearsky_tpu.models.rcm import RCM
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.utils.grids import pressuregrid

    lines = SpectralLines.from_par(CO2_PAR, maxlines=MAXLINES)
    nu_l = np.asarray(lines.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, N_NU)
    gas = DirectGas.from_lines(lines, 0.95, nu)
    Pe = pressuregrid(PT, PS, N_LEV)
    Te = np.maximum(285.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    return RCM.create(
        Pe, Te, G, lambda T, P: MU, 0.0, 0.0, lambda T, P: CP, 1e7, gas,
        core=core, radmul=2,
    )


def compute(backend):
    import jax
    import jax.numpy as jnp
    from clearsky_tpu.models import rcm as rcm_mod
    from clearsky_tpu.rt.fluxes import Radau, Discretized
    from clearsky_tpu.rt.radau import (
        build_column_cache, radau_outgoing, _rhs_emission, _rhs_args, _eff_tol,
        _default_atol,
    )
    from clearsky_tpu.ops.planck import planck
    from clearsky_tpu.utils.interp import interp_linear
    from clearsky_tpu.utils.radau import radau_scalar
    from clearsky_tpu.utils.quadrature import stream_nodes

    core_r = Radau(nstream=NSTREAM, tol=TOL)
    core_d = Discretized(nstream=NSTREAM, nlobatto=3)
    r_rad = build_rcm(core_r)
    r_dis = build_rcm(core_d)

    out = {"backend": backend, "dtype": str(r_rad.T.dtype)}

    # --- heating with both cores ---
    h_rad = jax.jit(lambda T: rcm_mod.heating(r_rad, T))
    h_dis = jax.jit(lambda T: rcm_mod.heating(r_dis, T))
    t0 = time.perf_counter()
    H_rad = np.asarray(jax.block_until_ready(h_rad(r_rad.T)))
    out["compile_s_radau_heating"] = time.perf_counter() - t0
    H_dis = np.asarray(jax.block_until_ready(h_dis(r_dis.T)))
    out["H_radau"] = H_rad
    out["H_disc"] = H_dis

    # --- OLR with both engines, through the accelerated cache ---
    lnP = jnp.log(r_rad.P)
    fT = lambda P: interp_linear(jnp.log(P), lnP, r_rad.T)
    cache = build_column_cache(r_rad.Pr, fT, r_rad.fmu, r_rad.A)
    olr_rad = np.asarray(
        jax.block_until_ready(
            jax.jit(
                lambda: radau_outgoing(
                    cache, float(np.asarray(r_rad.Pe)[-1]),
                    float(np.asarray(r_rad.Pe)[0]), G,
                    nstream=NSTREAM, tol=TOL,
                )
            )()
        )
    )
    from clearsky_tpu.rt.discretized import layer_tau, monoflux
    from clearsky_tpu.rt.fluxes import outgoing

    olr_dis = np.asarray(
        jax.block_until_ready(
            outgoing(
                np.asarray(r_rad.Pr), G, fT, r_rad.fmu, r_rad.A,
                core=core_d,
            )
        )
    )
    out["olr_radau"] = olr_rad
    out["olr_disc"] = olr_dis
    out["nu"] = np.asarray(r_rad.nu)

    # --- per-lane step statistics on the upward OLR leg ---
    dtype = cache.T.dtype
    n_nu = cache.nu.shape[0]
    m, W = stream_nodes(NSTREAM)
    ns = len(m)
    nu_idx = jnp.tile(jnp.arange(n_nu, dtype=jnp.int32), ns)
    nu_val = jnp.tile(cache.nu.astype(dtype), ns)
    m_lane = jnp.repeat(jnp.asarray(m, dtype), n_nu)
    Ps_ = float(np.asarray(r_rad.Pe)[-1])
    Pt_ = float(np.asarray(r_rad.Pe)[0])
    i = np.searchsorted(np.asarray(cache.lnP), np.log(Ps_), side="right") - 1
    i = int(np.clip(i, 0, cache.lnP.shape[0] - 2))
    lnPn = np.asarray(cache.lnP)
    t = (np.log(Ps_) - lnPn[i]) / (lnPn[i + 1] - lnPn[i])
    Ts = float(np.asarray(cache.T)[i] + t * (np.asarray(cache.T)[i + 1] - np.asarray(cache.T)[i]))
    B_s = planck(cache.nu.astype(dtype), jnp.asarray(Ts, dtype))
    I0 = jnp.tile(B_s, ns)
    args = _rhs_args(cache, G, nu_idx, nu_val, m_lane)
    tol = _eff_tol(TOL, dtype)
    atol = _default_atol(tol, jnp.max(B_s))
    res = radau_scalar(
        _rhs_emission, I0, -np.sqrt(Ps_), -np.sqrt(Pt_), args=args,
        rtol=tol, atol=atol, newton_iters=2, max_steps=10_000,
    )
    steps = np.asarray(jax.block_until_ready(res.steps))
    ok = np.asarray(res.ok)
    out["steps_min"] = int(steps.min())
    out["steps_mean"] = float(steps.mean())
    out["steps_max"] = int(steps.max())
    out["ok_fraction"] = float(ok.mean())
    out["eff_rtol"] = float(tol)

    # --- wall time: chain K heating calls with a data dependency ---
    from jax import lax

    K = 8

    def chained(hfn, T0):
        @jax.jit
        def go(T):
            def body(Tc, _):
                H = hfn(Tc)
                return Tc + 1e-30 * H, None
            Tn, _ = lax.scan(body, T, None, length=K)
            return Tn
        return go

    for name, hfn, rr in (("radau", None, r_rad), ("disc", None, r_dis)):
        f = chained(lambda T, rr=rr: rcm_mod.heating(rr, T), rr.T)
        float(np.asarray(f(rr.T)).sum())  # compile
        times = []
        for k in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(rr.T + 0.01 * k)).sum())
            times.append(time.perf_counter() - t0)
        rtts = []
        for k in range(5):
            t0 = time.perf_counter()
            float((rr.T + 1.0 + k).sum())
            rtts.append(time.perf_counter() - t0)
        per = max(min(times) - min(rtts), 1e-9) / K
        out[f"heating_ms_{name}"] = per * 1e3
    return out


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    import jax

    if phase == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        out = compute("cpu")
        np.savez(
            CACHE,
            **{k: v for k, v in out.items() if isinstance(v, np.ndarray)},
            meta=json.dumps({k: v for k, v in out.items() if not isinstance(v, np.ndarray)}),
        )
        print("cpu reference written:", CACHE)
        print(json.dumps({k: v for k, v in out.items() if not isinstance(v, np.ndarray)}, indent=1))
        return

    assert jax.default_backend() == "tpu", jax.default_backend()
    out = compute("tpu")
    ref = np.load(CACHE, allow_pickle=True)
    meta = json.loads(str(ref["meta"]))
    rep = {k: v for k, v in out.items() if not isinstance(v, np.ndarray)}
    rep["cpu_meta"] = meta

    scaleH = np.abs(ref["H_radau"]).max()
    rep["H_radau_tpu_vs_cpu_of_peak"] = float(
        np.abs(out["H_radau"] - ref["H_radau"]).max() / scaleH
    )
    rep["H_radau_vs_disc_tpu_of_peak"] = float(
        np.abs(out["H_radau"] - out["H_disc"]).max() / np.abs(out["H_disc"]).max()
    )
    rep["H_disc_tpu_vs_cpu_of_peak"] = float(
        np.abs(out["H_disc"] - ref["H_disc"]).max() / np.abs(ref["H_disc"]).max()
    )
    nu = out["nu"]
    band = lambda y: np.trapezoid(y, nu)
    rep["olr_radau_tpu_band"] = float(band(out["olr_radau"]))
    rep["olr_radau_cpu_band"] = float(band(ref["olr_radau"]))
    rep["olr_band_rel_tpu_vs_cpu"] = float(
        abs(band(out["olr_radau"]) - band(ref["olr_radau"])) / band(ref["olr_radau"])
    )
    rep["olr_radau_vs_disc_tpu_of_peak"] = float(
        np.abs(out["olr_radau"] - out["olr_disc"]).max() / out["olr_disc"].max()
    )
    rep["olr_radau_tpu_vs_cpu_of_peak"] = float(
        np.abs(out["olr_radau"] - ref["olr_radau"]).max() / ref["olr_radau"].max()
    )
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
