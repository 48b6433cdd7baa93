"""Pallas TPU kernel for the discretized flux march (the config-3 hot path).

The XLA ``lax.scan`` march in :mod:`rt.discretized` is transcendental- and
loop-overhead-bound: at 2^19 points x 19 layers on v5e the two-march
``monoflux`` costs 4.1 ms at the best scan unroll against a ~0.2 ms byte
roof (scripts/march_unroll_ab.py), because every scan step round-trips the
[nstream, n_nu] carry through HBM and each layer's fusion launches
separately. This kernel runs the WHOLE column — downward emission march,
stellar beam attenuation, Lambertian surface coupling, upward march — for
one wavenumber block entirely in VMEM: tau and the level Planck rows are
read from HBM exactly once, the carries never leave registers/VMEM, and all
layers unroll into straight-line VPU code.

Layout: wavenumbers on lanes (``BLOCK_N`` per grid step), hemispheric
streams on sublanes ([8, BLOCK_N] tiles; unused streams ride along with
m = W = 0, which the march maps to an exact identity). Layers are a static
Python loop — guarded by ``MAX_LAYERS`` to bound compile time; larger
columns fall back to the XLA scan automatically (rt.discretized dispatch).

The physics replicated here is exactly ``rt.discretized``'s floorless
linear-in-tau march (ref ClearSky.jl discretized.jl:249-326); agreement
with the jnp oracle is gated in tests/test_march_pallas.py. Differentiation
is handled in ``rt.discretized`` by a custom JVP that routes tangents
through the XLA implementation.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["monoflux_pallas", "pack_mw", "BLOCK_N", "MAX_LAYERS"]

BLOCK_N = 1024     # wavenumber lanes per grid step (8 f32 vregs wide)
MAX_LAYERS = 128   # static-unroll guard; beyond this the XLA scan is used

_INV_PI = float(1.0 / np.pi)


def _ratio_series(tm):
    """(1 - e^-tm)/tm = sum_k (-tm)^k/(k+1)!, valid below the 0.25 switch.

    f32 keeps 7 terms (truncation <= 0.25^7/8! ~ 1.5e-9 relative at the
    switch — an order below f32 roundoff); f64 keeps 11 (< 2.4e-14)."""
    if jnp.asarray(tm).dtype == jnp.float32:
        return 1.0 - tm * (0.5 - tm * ((1.0 / 6.0) - tm * (
            (1.0 / 24.0) - tm * ((1.0 / 120.0) - tm * ((1.0 / 720.0)
                                                       - tm * (1.0 / 5040.0))))))
    return 1.0 - tm * (0.5 - tm * ((1.0 / 6.0) - tm * (
        (1.0 / 24.0) - tm * ((1.0 / 120.0) - tm * ((1.0 / 720.0) - tm * (
            (1.0 / 5040.0) - tm * ((1.0 / 40320.0) - tm * (
                (1.0 / 362880.0) - tm * (1.0 / 3628800.0)))))))))


def _trans_emit(tm):
    """(t, omt, ratio): transmittance e^-tm, its complement -expm1(-tm), and
    the linear-in-tau emission ratio omt/tm — all from ONE exp and ONE
    series evaluation (round 5: the kernel previously evaluated a separate
    3-term ratio series inside layer_planck on top of the omt series; the
    ratio series IS the omt series' inner factor, so sharing it deletes
    ~4 full-vreg ops per layer per sweep).

    Forming 1 - exp(-tm) directly is the documented f32 catastrophe for
    transparent layers, and XLA's TPU expm1 lowering measures 1.1e-4 max
    relative error near tm ~ 0.013 (round 4) — hence the series/exp split
    at tm = 0.25: below it omt = tm * ratio_series (exact to f32 roundoff),
    above it 1 - e costs at most one ulp of exp absolute, <= 2.7e-7
    relative at the switch. ratio has no 0/0 hazard this way: the series
    needs no divide, and the large branch divides by tm >= 0.25.
    """
    e = jnp.exp(-tm)
    r = _ratio_series(tm)
    small = tm < 0.25
    omt_l = 1.0 - e
    ratio = jnp.where(small, r, omt_l / jnp.where(small, 1.0, tm))
    omt = jnp.where(small, tm * r, omt_l)
    return 1.0 - omt, omt, ratio




def _layer_planck(b1, b2, t, omt, ratio):
    """Linear-in-tau layer emission on kernel values
    (rt.discretized.layer_planck) with the stable ratio = omt/tm already
    computed by :func:`_trans_emit`."""
    dB = b1 - b2
    return b2 * omt - dB * t + ratio * dB


def _march_kernel(tau_ref, B_ref, S_ref, a_ref, mw_ref, c_ref,
                  md_ref, mu_ref, ms_ref, *, L, thermal_only, beam_row):
    """One nu block: down march (+ beam) -> surface -> up march.

    tau_ref [L, NB]; B_ref [L+1, NB]; S_ref/a_ref [1, NB]; mw_ref [16, 1]
    (stream slants m in rows 0-7, weights W in rows 8-15, zero-padded);
    c_ref [1, 1] = cos(theta_s). Outputs: md_ref [L, NB] with row l =
    M_down at level l+1 (emission + beam; level 0 is the beam top, added by
    the wrapper), mu_ref [L, NB] with row l = M_up at level l, ms_ref
    [1, NB] = M_up at the surface (pi * I_surf).
    """
    m = mw_ref[pl.ds(0, 8), :]       # [8, 1]
    W = mw_ref[pl.ds(8, 8), :]
    nb = tau_ref.shape[1]

    if not thermal_only:
        c = c_ref[0, 0]
        inv_c = 1.0 / c
        # ride the beam on a FREE sublane row of the stream tile (nstream
        # <= 5 leaves rows 5-7 unused): with slant 1/cos(theta_s) in that
        # row, its transmittance t[row] IS the beam attenuation factor —
        # one [8, NB] exp instead of an extra [1, NB] exp per layer (free
        # rows have W = 0, so the garbage their layer_planck rows
        # accumulate never reaches an output). With all 8 rows occupied by
        # real streams the beam pays for its own exp.
        if beam_row is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            onehot = (row == beam_row).astype(m.dtype)
            m_beam = m + onehot * (inv_c - m[beam_row:beam_row + 1, :])
        else:
            m_beam = m
        I = jnp.zeros((8, nb), dtype=tau_ref.dtype)
        bm = c * S_ref[pl.ds(0, 1), :]           # beam below level 0
        for l in range(L):
            tl = tau_ref[pl.ds(l, 1), :]         # [1, NB]
            b1 = B_ref[pl.ds(l, 1), :]
            b2 = B_ref[pl.ds(l + 1, 1), :]
            tm = tl * m_beam                     # [8, NB]
            t, omt, ratio = _trans_emit(tm)      # see rt.discretized._march
            I = I * t + _layer_planck(b1, b2, t, omt, ratio)
            if beam_row is not None:
                bm = bm * t[beam_row:beam_row + 1, :]
            else:
                bm = bm * jnp.exp(-tl * inv_c)
            e = jnp.sum(W * I, axis=0, keepdims=True)
            md_ref[pl.ds(l, 1), :] = e + bm
        M_surf_down = e + bm                     # M_down at the surface level
        I_surf = M_surf_down * (a_ref[pl.ds(0, 1), :] * _INV_PI) \
            + B_ref[pl.ds(L, 1), :]
    else:
        I_surf = B_ref[pl.ds(L, 1), :]
    ms_ref[pl.ds(0, 1), :] = np.pi * I_surf

    I = jnp.broadcast_to(I_surf, (8, nb)) * jnp.ones((8, 1), tau_ref.dtype)
    for l in range(L - 1, -1, -1):
        tl = tau_ref[pl.ds(l, 1), :]
        b1 = B_ref[pl.ds(l + 1, 1), :]           # enter from below
        b2 = B_ref[pl.ds(l, 1), :]
        tm = tl * m
        t, omt, ratio = _trans_emit(tm)
        I = I * t + _layer_planck(b1, b2, t, omt, ratio)
        mu_ref[pl.ds(l, 1), :] = jnp.sum(W * I, axis=0, keepdims=True)


def _olr_kernel(tau_ref, B_ref, mw_ref, o_ref, *, L):
    """TOA-only upward march (the ``outgoing_flux`` hot path): identical
    physics to the up-sweep of :func:`_march_kernel`, but the per-layer
    weighted reductions and [L, NB] flux writes are dropped — only the final
    TOA intensity is reduced. Saves ~25% of the up-march instruction count
    and L rows of HBM writes per block."""
    m = mw_ref[pl.ds(0, 8), :]
    W = mw_ref[pl.ds(8, 8), :]
    nb = tau_ref.shape[1]
    I = jnp.broadcast_to(B_ref[pl.ds(L, 1), :], (8, nb)) \
        * jnp.ones((8, 1), tau_ref.dtype)
    for l in range(L - 1, -1, -1):
        tl = tau_ref[pl.ds(l, 1), :]
        b1 = B_ref[pl.ds(l + 1, 1), :]
        b2 = B_ref[pl.ds(l, 1), :]
        tm = tl * m
        t, omt, ratio = _trans_emit(tm)
        I = I * t + _layer_planck(b1, b2, t, omt, ratio)
    o_ref[pl.ds(0, 1), :] = jnp.sum(W * I, axis=0, keepdims=True)


def olr_pallas(tau, B, m, W, interpret: bool = False,
               block_n: int = BLOCK_N, mw=None):
    """Outgoing monochromatic flux at TOA [n_nu] via the TOA-only fused march.

    Semantics of ``rt.discretized.outgoing_flux`` (surface Planck emission
    marched upward through hemispheric streams; the reference's working
    ``outgoing``, ref fluxes.jl:133-158)."""
    dt = tau.dtype
    L, N = tau.shape
    if not (1 <= L <= MAX_LAYERS):
        raise ValueError(f"olr kernel needs 1 <= L <= {MAX_LAYERS}, got {L}")
    if mw is None:
        mw = jnp.asarray(pack_mw(m, W), dtype=dt)
    else:
        mw = mw.astype(dt)
    Np = -(-N // block_n) * block_n
    pad = Np - N
    if pad:
        tau = jnp.pad(tau, ((0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, pad)))
    grid = (Np // block_n,)
    blk = lambda r: pl.BlockSpec((r, block_n), lambda i: (0, i))
    fix = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    out = pl.pallas_call(
        partial(_olr_kernel, L=L),
        grid=grid,
        in_specs=[blk(L), blk(L + 1), fix(16, 1)],
        out_specs=blk(1),
        out_shape=jax.ShapeDtypeStruct((1, Np), dt),
        interpret=interpret,
    )(tau, B, mw)
    return out[0, :N]


def pack_mw(m, W, dtype=np.float64) -> np.ndarray:
    """Pack stream slants and weights into the kernel's [16, 1] operand
    (rows 0-7 = m zero-padded, rows 8-15 = W)."""
    nst = len(m)
    if nst > 8:
        raise ValueError("march kernel packs streams on sublanes; nstream <= 8")
    mw = np.zeros((16, 1), dtype=dtype)
    mw[:nst, 0] = np.asarray(m, dtype=dtype)
    mw[8:8 + nst, 0] = np.asarray(W, dtype=dtype)
    return mw


def monoflux_pallas(tau, B, S_nu, albedo_nu, ctheta, m, W,
                    thermal_only: bool = False, interpret: bool = False,
                    block_n: int = BLOCK_N, mw=None):
    """Whole-column up/down monochromatic fluxes via the fused march kernel.

    Same contract as ``rt.discretized.monoflux`` with the stream nodes
    (m, W) precomputed by the caller and ``ctheta = cos(theta_s)`` passed as
    a (traced or concrete) scalar. Returns (M_up [np, n_nu],
    M_down [np, n_nu]); with ``thermal_only`` the down-march is skipped and
    M_down is returned as zeros (the ``outgoing_flux`` case: M_up[0] is the
    OLR spectrum).
    """
    dt = tau.dtype
    L, N = tau.shape
    if L > MAX_LAYERS:
        raise ValueError(f"march kernel is static-unrolled; L={L} exceeds "
                         f"MAX_LAYERS={MAX_LAYERS}")
    if L < 1:
        # a zero-layer column would hit the kernel's read-after-loop of the
        # down-march emission (UnboundLocalError at trace time); reject with
        # a shape error instead
        raise ValueError("march kernel needs at least one layer (two levels)")
    nst = len(m)
    if nst > 8:
        raise ValueError("march kernel packs streams on sublanes; nstream <= 8")
    if mw is None:
        mw = jnp.asarray(pack_mw(m, W), dtype=dt)
    else:
        # caller-provided operand (the custom_partitioning wrapper passes it
        # explicitly: a traced-in constant would leave a const in the traced
        # jaxpr, which custom_partitioning rejects)
        mw = mw.astype(dt)

    Np = -(-N // block_n) * block_n
    pad = Np - N
    if pad:
        tau = jnp.pad(tau, ((0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, pad)))
        S_nu = jnp.pad(S_nu, (0, pad))
        albedo_nu = jnp.pad(albedo_nu, (0, pad))
    S2 = S_nu[None, :].astype(dt)
    a2 = albedo_nu[None, :].astype(dt)
    c2 = jnp.reshape(jnp.asarray(ctheta, dtype=dt), (1, 1))

    grid = (Np // block_n,)
    blk = lambda r: pl.BlockSpec((r, block_n), lambda i: (0, i))
    fix = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    md, mu, ms = pl.pallas_call(
        partial(_march_kernel, L=L, thermal_only=thermal_only,
                beam_row=nst if nst <= 7 else None),
        grid=grid,
        in_specs=[blk(L), blk(L + 1), blk(1), blk(1), fix(16, 1), fix(1, 1)],
        out_specs=[blk(L), blk(L), blk(1)],
        out_shape=[
            jax.ShapeDtypeStruct((L, Np), dt),
            jax.ShapeDtypeStruct((L, Np), dt),
            jax.ShapeDtypeStruct((1, Np), dt),
        ],
        interpret=interpret,
    )(tau, B, S2, a2, mw, c2)

    M_up = jnp.concatenate([mu, ms], axis=0)[:, :N]
    if thermal_only:
        M_down = jnp.zeros_like(M_up)
    else:
        beam_top = (c2[0, 0] * S2)[:, :]                   # [1, Np]
        M_down = jnp.concatenate([beam_top, md], axis=0)[:, :N]
    return M_up, M_down
