"""TPU probe: is the per-state f32 divide the voigt far-tile bottleneck?

Variants of the (pre-transposed) grouped kernel's far tile:
  base  : production (one jnp divide per state per tile)
  nodiv : divide replaced by multiply (WRONG values, perf bound only)
  magic : reciprocal via the 0x7EF311C3 exponent hack + 2 Newton steps
          (correct to ~1e-7 rel; 5 cheap ops instead of the lowered divide)

Run:  python scripts/probe_div.py
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


def _recip_magic(d):
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    r = jax.lax.bitcast_convert_type(jnp.int32(0x7EF311C3) - bits, jnp.float32)
    r = r * (2.0 - d * r)
    r = r * (2.0 - d * r)
    return r


def make_kernel(divmode):
    orig = lp._kernel_resident_grouped

    def kern(shape, cut, n_states, n_params, split, lgroup, nu_b_ref,
             nu_b_lo_ref, PkT_ref, scal_ref, dnear_ref, T_ref, out_ref):
        B = nu_b_ref.shape[-1]
        nu_b = nu_b_ref[0, 0, :].reshape(1, B)
        nu_b_lo = nu_b_lo_ref[0, 0, :].reshape(1, B)
        b = pl.program_id(0)
        LG = lgroup
        acc0 = tuple(jnp.zeros((LG, B), jnp.float32) for _ in range(n_states))
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (LG, 1), 0)

        def tile_near(rows, dnu, mask, acc):
            new = []
            for st in range(n_states):
                b0 = 2 + 7 * st
                Sia = rows[:, b0 : b0 + 1]
                ia = rows[:, b0 + 1 : b0 + 2]
                y0 = rows[:, b0 + 2 : b0 + 3]
                f = Sia * lp.wofz_re(dnu * ia, y0)
                new.append(acc[st] + jnp.where(mask, f, 0.0))
            return tuple(new)

        def tile_far(rows, dnu, mask, acc):
            D = dnu * dnu
            new = []
            for st in range(n_states):
                b0 = 2 + 7 * st
                A = rows[:, b0 + 3 : b0 + 4]
                c1 = rows[:, b0 + 4 : b0 + 5]
                c2 = rows[:, b0 + 5 : b0 + 6]
                k2 = rows[:, b0 + 6 : b0 + 7]
                m = D * A
                br = c1 - m
                d2 = br * br + c2 * D
                if divmode == "base":
                    f = (k2 * (c1 + m)) / d2
                elif divmode == "nodiv":
                    f = (k2 * (c1 + m)) * d2
                else:
                    f = (k2 * (c1 + m)) * _recip_magic(d2)
                new.append(acc[st] + jnp.where(mask, f, 0.0))
            return tuple(new)

        def sweep(start, cnt, tile_fn, mask_fn, acc):
            start_al = pl.multiple_of((start // LG) * LG, LG)
            off = start - start_al
            end = jnp.where(cnt == 0, 0, off + cnt)

            def group_body(g, acc):
                o = pl.multiple_of(start_al + g * LG, LG)
                rows = PkT_ref[pl.ds(o, LG), :]
                nul = rows[:, 0:1]
                nul_lo = rows[:, 1:2]
                dnu = (nu_b - nul) + (nu_b_lo - nul_lo)
                local = g * LG + iota_g
                mask = (local < end) & mask_fn(jnp.abs(dnu))
                return tile_fn(rows, dnu, mask, acc)

            ngroups = (end + LG - 1) // LG
            return jax.lax.fori_loop(0, ngroups, group_body, acc)

        d_near = dnear_ref[0, 0]
        acc = sweep(scal_ref[b, 0], scal_ref[b, 1], tile_far,
                    lambda a: (a <= cut) & (a > d_near), acc0)
        acc = sweep(scal_ref[b, 2], scal_ref[b, 3], tile_near,
                    lambda a: a <= d_near, acc)
        for st in range(n_states):
            out_ref[st, 0, 0, :] = jnp.sum(acc[st], axis=0)

    return kern


def time_variant(tag, plan, lines, Tj, Pj, Pp, evals):
    lp.sigma_from_lines_pallas.clear_cache()

    @jax.jit
    def chained(T0):
        def body(Tc, _):
            s = lp.sigma_from_lines_pallas(plan, lines, Tc, Pj, Pp, "voigt")
            return Tc + 1e-30 * s.sum(axis=1), None
        Tn, _ = lax.scan(body, T0, None, length=N_CHAIN)
        return Tn

    float(chained(Tj).sum())
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
    per_call = max(min(times) - min(rtts), 1e-9) / N_CHAIN
    rate = evals / per_call
    print(f"[{tag}] {rate:.3e} evals/s (per_call {per_call*1e3:.2f} ms)", flush=True)
    return rate


def main():
    assert jax.default_backend() == "tpu"
    lines = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(lines.nu)
    nu = np.linspace(nu_l.min() - 25.0, nu_l.max() + 25.0, N_NU)
    plan = build_line_window_plan(nu, nu_l, 25.0, block=128)
    lo = np.searchsorted(nu_l, nu - 25.0, "left")
    hi = np.searchsorted(nu_l, nu + 25.0, "right")
    evals = int(np.sum(hi - lo)) * N_STATES
    T = jnp.asarray(np.linspace(180.0, 320.0, N_STATES), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), N_STATES)), jnp.float32)
    Pp = 0.95 * P

    orig = lp._kernel_resident_grouped
    try:
        base_out = np.asarray(lp.sigma_from_lines_pallas(plan, lines, T, P, Pp, "voigt"))
        r0 = time_variant("base ", plan, lines, T, P, Pp, evals)
        lp._kernel_resident_grouped = make_kernel("nodiv")
        r1 = time_variant("nodiv", plan, lines, T, P, Pp, evals)
        lp._kernel_resident_grouped = make_kernel("magic")
        m_out = np.asarray(lp.sigma_from_lines_pallas(plan, lines, T, P, Pp, "voigt"))
        d = np.nanmax(np.abs(m_out - base_out) / np.abs(base_out).max(axis=1, keepdims=True))
        print(f"[magic] max rel-of-rowpeak diff vs base: {d:.2e}")
        r2 = time_variant("magic", plan, lines, T, P, Pp, evals)
    finally:
        lp._kernel_resident_grouped = orig
        lp.sigma_from_lines_pallas.clear_cache()
    print(f"nodiv {r1/r0:.2f}x, magic {r2/r0:.2f}x over base")


if __name__ == "__main__":
    main()
