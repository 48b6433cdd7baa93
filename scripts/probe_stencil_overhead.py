"""Decompose the stencil-near XLA correction pass on the bench geometry
(VERDICT r4 weak #3: ~0.6 ms of the 1.9 ms voigt bench call sits in XLA
stencil-correction ops — which sub-stage dominates?).

Stages timed separately (K-chained, RTT-subtracted, real TPU):
  full      — the whole _stencil_apply
  w4        — window offsets -> wofz_re -> corr tensor [2K, st, L]
  pack      — corr -> payload transpose/reshape/concat
  place     — per-class slices + one-hot einsum + rows.at[].set
  untrans   — final [CH*CROWS*K, st] -> [st, n_nu] transpose

Run: timeout 3000 python scripts/probe_stencil_overhead.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.ops.linesum import build_line_window_plan, _line_params
from clearsky_tpu.ops import linesum_pallas as LP

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
N_NU = 131072
N_STATES = 16
CUT = 25.0


def timed(fn, args, K=64, reps=3):
    @jax.jit
    def ch(x, *a):
        def body(c, _):
            return c + 1e-30 * fn(c, *a), None
        c, _ = lax.scan(body, x, None, length=K)
        return c

    x0 = jnp.asarray(0.0, jnp.float32)
    float(np.asarray(ch(x0, *args)))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(ch(x0 + 0.01 * i, *args)))
        ts.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((x0 + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    return max(min(ts) - min(rtts), 1e-9) / K


def main():
    lines = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(lines.nu)
    nu = np.linspace(nu_l.min() - CUT, nu_l.max() + CUT, N_NU)
    plan = build_line_window_plan(nu, nu_l, CUT, block=128)
    geom = LP._stencil_geom_cached(plan, lines)
    assert geom is not None
    meta, arrays_np = geom
    arrays = {k: jnp.asarray(v) for k, v in arrays_np.items()}
    K_, R, CH, L, classes = meta
    print(f"geom: K={K_} R={R} CH={CH} L={L} classes="
          + str([(len(ids), Mpad) for ids, _, Mpad in classes]), flush=True)

    T = jnp.asarray(np.linspace(180.0, 320.0, N_STATES), jnp.float32)
    P = jnp.asarray(np.exp(np.linspace(np.log(10.0), np.log(1e5), N_STATES)),
                    jnp.float32)
    Pp = 0.95 * P
    S, alpha, gamma = _line_params(lines, T, P, Pp)
    S = S.astype(jnp.float32)
    alpha = alpha.astype(jnp.float32)
    gamma = gamma.astype(jnp.float32)
    n_states = N_STATES

    def full(c, S, alpha, gamma):
        return LP._stencil_apply("voigt", meta, arrays, S * (1 + c), alpha,
                                 gamma, T, CUT, N_NU).sum()

    def w4_stage(c, S, alpha, gamma):
        ia = 1.0 / alpha
        Sia = S * (1 + c) * ia * (1.0 / LP._SQRT_PI)
        y0 = gamma * ia
        dnu_hi = arrays["dnu_hi"]
        dnu_lo = arrays["dnu_lo"]
        x = ia[None] * dnu_hi[:, None, :] + ia[None] * dnu_lo[:, None, :]
        y = jnp.broadcast_to(y0[None], x.shape)
        w4 = LP.wofz_re(x, y)
        t2r = y * y - x * x
        t2i = -2.0 * x * y
        br = 0.5 + t2r
        d2 = br * br + t2i * t2i
        wr1 = 0.5641896 * (y * br - x * t2i) / d2
        corr = Sia[None] * (w4 - wr1)
        mask = (x * x <= 225.0) & (jnp.abs(dnu_hi) <= CUT)[:, None, :]
        return jnp.where(mask, corr, 0.0).sum()

    def make_corr(c):
        # cheap stand-in tensor with the right shape for the later stages
        dnu_hi = arrays["dnu_hi"]
        return dnu_hi[:, None, :] * (1.0 + c) * jnp.ones((1, n_states, 1),
                                                         jnp.float32)

    def pack_stage(c):
        corr = make_corr(c)
        pay = corr.reshape(2 * K_ * n_states, L).T.reshape(2 * L, K_ * n_states)
        max_pad = max(Mpad for _, _, Mpad in classes)
        pay = jnp.concatenate(
            [pay, jnp.zeros((max_pad, K_ * n_states), jnp.float32)], axis=0)
        return pay.sum()

    def place_stage(c):
        corr = make_corr(c)
        pay = corr.reshape(2 * K_ * n_states, L).T.reshape(2 * L, K_ * n_states)
        max_pad = max(Mpad for _, _, Mpad in classes)
        pay = jnp.concatenate(
            [pay, jnp.zeros((max_pad, K_ * n_states), jnp.float32)], axis=0)
        rows = jnp.zeros((CH, LP._STENCIL_CROWS, K_ * n_states), jnp.float32)
        for i, (ids, starts, Mpad) in enumerate(classes):
            OH = arrays[f"oh{i}"]
            chunks = jnp.stack([
                jax.lax.slice(pay, (s, 0), (s + Mpad, K_ * n_states))
                for s in starts
            ])
            oc = jnp.einsum("cim,cmk->cik", OH, chunks,
                            precision=jax.lax.Precision.HIGH)
            rows = rows.at[jnp.asarray(ids, jnp.int32)].set(oc)
        return rows.sum()

    def untrans_stage(c):
        rows = jnp.zeros((CH, LP._STENCIL_CROWS, K_ * n_states), jnp.float32) \
            + c
        out = rows.reshape(CH * LP._STENCIL_CROWS * K_, n_states).T
        return out[:, :N_NU].sum()

    for name, fn, args in (
        ("full", full, (S, alpha, gamma)),
        ("w4", w4_stage, (S, alpha, gamma)),
        ("pack", pack_stage, ()),
        ("place", place_stage, ()),
        ("untrans", untrans_stage, ()),
    ):
        dt = timed(fn, args)
        print(f"{name:8s}: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
