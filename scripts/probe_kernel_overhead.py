"""TPU probes: decompose the grouped line-sum kernel's per-iteration cost.

Monkeypatches `_kernel_resident_grouped` with instrumented variants (each a
copy with one cost removed) and times them with the robust chained-scan
methodology. The variants compute WRONG sigma — they are probes, not
optimizations; the jit caches are cleared between variants.

  base   : the production kernel
  accwide: [LG, B] accumulators per state, one sublane reduction per block
           at the end instead of one per group iteration (candidate change)
  cheap  : profile replaced by 2-flop S*dnu (bounds total profile flops)
  const  : S/alpha/gamma constant 1.0 — no per-state column slices of the
           transposed tile (bounds slice/broadcast cost)
  faronly: split disabled at the call site, far sweep only with full mask
           (bounds the near-sweep + second-sweep overhead)

Run:  python scripts/probe_kernel_overhead.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

import clearsky_tpu.ops.linesum_pallas as lp
from clearsky_tpu.ops.linesum import build_line_window_plan
from clearsky_tpu.spectra.lines import SpectralLines

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
N_NU = 131072
N_STATES = 16
N_CHAIN = 64
CHUNK = lp.CHUNK


def make_kernel(acc_wide=False, const_params=False, profile_cheap=False):
    def kern(shape, cut, n_states, n_params, split, lgroup, nu_b_ref,
             nu_b_lo_ref, Pk_ref, scal_ref, dnear_ref, T_ref, out_ref, Pt_ref):
        B = nu_b_ref.shape[-1]
        nu_b = nu_b_ref[0, 0, :].reshape(1, B)
        nu_b_lo = nu_b_lo_ref[0, 0, :].reshape(1, B)
        b = pl.program_id(0)
        LG = lgroup
        acc_shape = (LG, B) if acc_wide else (1, B)
        acc0 = tuple(jnp.zeros(acc_shape, jnp.float32) for _ in range(n_states))
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (LG, 1), 0)

        def sweep(start, cnt, profile_fn, mask_fn, acc):
            start_al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            off = start - start_al
            end = off + cnt

            def chunk_body(c, acc):
                o = pl.multiple_of(start_al + c * CHUNK, CHUNK)
                Pt_ref[:, :] = Pk_ref[:, pl.ds(o, CHUNK)].T
                g_lo = jnp.maximum(0, (off - c * CHUNK)) // LG
                g_hi = jnp.minimum(CHUNK // LG, (end - c * CHUNK + LG - 1) // LG)

                def group_body(g, acc):
                    rows = Pt_ref[pl.ds(pl.multiple_of(g * LG, LG), LG), :]
                    nul = rows[:, 0:1]
                    nul_lo = rows[:, 1:2]
                    dnu = (nu_b - nul) + (nu_b_lo - nul_lo)
                    local = c * CHUNK + g * LG + iota_g
                    mask = (local < end) & mask_fn(jnp.abs(dnu))
                    new = []
                    for st in range(n_states):
                        if const_params:
                            S = al = ga = jnp.float32(1.0)
                        else:
                            S = rows[:, 2 + 3 * st: 3 + 3 * st]
                            al = rows[:, 3 + 3 * st: 4 + 3 * st]
                            ga = rows[:, 4 + 3 * st: 5 + 3 * st]
                        if profile_cheap:
                            f = S * dnu
                        else:
                            f = profile_fn(shape, dnu, S, al, ga, T_ref[st, 0])
                        if acc_wide:
                            new.append(acc[st] + jnp.where(mask, f, 0.0))
                        else:
                            contrib = jnp.sum(jnp.where(mask, f, 0.0), axis=0).reshape(1, B)
                            new.append(acc[st] + contrib)
                    return tuple(new)

                return jax.lax.fori_loop(g_lo, g_hi, group_body, acc)

            nchunks = (end + CHUNK - 1) // CHUNK
            return jax.lax.fori_loop(0, nchunks, chunk_body, acc)

        start = scal_ref[b, 0]
        cnt = scal_ref[b, 1]
        if split:
            d_near = dnear_ref[0, 0]
            acc = sweep(start, cnt, lp._profile_far,
                        lambda a: (a <= cut) & (a > d_near), acc0)
            acc = sweep(scal_ref[b, 2], scal_ref[b, 3], lp._profile_tile,
                        lambda a: a <= d_near, acc)
        else:
            acc = sweep(start, cnt, lp._profile_tile, lambda a: a <= cut, acc0)
        for st in range(n_states):
            if acc_wide:
                out_ref[st, 0, 0, :] = jnp.sum(acc[st], axis=0)
            else:
                out_ref[st, 0, 0, :] = acc[st][0, :]

    return kern


def time_variant(tag, plan, lines, Tj, Pj, Pp, evals, strategy="auto"):
    lp.sigma_from_lines_pallas.clear_cache()

    @jax.jit
    def chained(T0):
        def body(Tc, _):
            s = lp.sigma_from_lines_pallas(plan, lines, Tc, Pj, Pp, "voigt",
                                           strategy=strategy)
            return Tc + 1e-30 * s.sum(axis=1), None
        Tn, _ = lax.scan(body, T0, None, length=N_CHAIN)
        return Tn

    t0 = time.perf_counter()
    float(chained(Tj).sum())
    compile_s = time.perf_counter() - t0
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
    print(f"[{tag}] {rate:.3e} evals/s  per_call={per_call*1e3:.2f}ms "
          f"(compile {compile_s:.1f}s, rtt {rtt*1e3:.0f}ms)", flush=True)
    return rate


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    lines = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(lines.nu)
    cut = 25.0
    nu = np.linspace(nu_l.min() - cut, nu_l.max() + cut, N_NU)
    plan = build_line_window_plan(nu, nu_l, cut, block=128)
    lo = np.searchsorted(nu_l, nu - cut, "left")
    hi = np.searchsorted(nu_l, nu + cut, "right")
    evals = int(np.sum(hi - lo)) * N_STATES
    T = jnp.asarray(np.linspace(180.0, 320.0, N_STATES), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), N_STATES)), jnp.float32)
    Pp = 0.95 * P

    orig = lp._kernel_resident_grouped
    results = {}
    try:
        sref = np.asarray(lp.sigma_from_lines_pallas(plan, lines, T, P, Pp, "voigt"))
        results["base"] = time_variant("base   ", plan, lines, T, P, Pp, evals)

        lp._kernel_resident_grouped = make_kernel(acc_wide=True)
        sacc = np.asarray(lp.sigma_from_lines_pallas(plan, lines, T, P, Pp, "voigt"))
        d = np.nanmax(np.abs(sacc - sref) / np.abs(sref).max(axis=1, keepdims=True))
        print(f"[accwide] max diff of rowpeak vs base: {d:.2e}", flush=True)
        results["accwide"] = time_variant("accwide", plan, lines, T, P, Pp, evals)

        lp._kernel_resident_grouped = make_kernel(profile_cheap=True)
        results["cheap"] = time_variant("cheap  ", plan, lines, T, P, Pp, evals)

        lp._kernel_resident_grouped = make_kernel(const_params=True)
        results["const"] = time_variant("const  ", plan, lines, T, P, Pp, evals)

        lp._kernel_resident_grouped = make_kernel(acc_wide=True, profile_cheap=True)
        results["accwide+cheap"] = time_variant("acc+chp", plan, lines, T, P, Pp, evals)
    finally:
        lp._kernel_resident_grouped = orig
        lp.sigma_from_lines_pallas.clear_cache()

    results["nosplit"] = time_variant("nosplit", plan, lines, T, P, Pp, evals,
                                      strategy="nosplit")
    for k, v in results.items():
        print(f"{k}: {v:.3e} ({v / results['base']:.2f}x base)")


if __name__ == "__main__":
    main()
