"""Fully-fused table-mode OLR: coefficients -> sigma -> tau -> march in ONE
Pallas kernel.

The production table pipeline (BASELINE config 2: baked CO2 table, 2^19
points, 20 levels, nstream 5 — ref ClearSky.jl fluxes.jl:195-404 composed
with gases.jl:66-85) spends its HBM budget on intermediates: the ln-sigma
contraction writes [57, N] (120 MB), exp reads/writes it again, the
quadrature matmul writes tau [19, N], and the march kernel reads tau + B.
This kernel keeps everything per nu-block in VMEM: the split-precision
coefficient block is read ONCE from HBM, contracted against the (tiny)
Chebyshev state basis on the MXU, exponentiated, reduced to per-layer tau by
the static Lobatto-quadrature matmul, and marched to the TOA — only the
Planck rows and the OLR row touch HBM besides the coefficients.

Why split precision is load-bearing here: an in-kernel full-f32 [57, 288] @
[288, NB] contraction at HIGHEST precision costs ~6 MXU passes (~0.5 ms at
2^19); the split form (f32 lead of 16 rows + single-pass bf16 tail with f32
accumulation) cuts that to ~0.1 ms AND halves the coefficient bytes — the
same accuracy contract as ``Gas.split_precision`` (band OLR delta vs the
full-f32 table measured 8.9e-8 on hardware).

Differentiation: ``table_olr_fused`` carries a custom JVP that routes
tangents through the unfused XLA pipeline (same physics), like the march
kernel itself.
"""

from __future__ import annotations

from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..constants import N_AVOGADRO
from ..utils.interp import cheb_basis
from ..utils.quadrature import stream_nodes, lobatto_unit_nodes
from .march_pallas import _trans_emit, _layer_planck, pack_mw, MAX_LAYERS
from .discretized import lobatto_pressures, _olr_scan

__all__ = ["table_olr_fused", "table_monoflux_fused", "fused_table_applicable"]

# A/B'd on hardware at 2^19 x 19 layers (scripts/tpu_fused_olr_drive.py
# sweep): 256: 1.65, 512: 1.79, 1024: 1.20, 2048: 1.27 ms/call
BLOCK_N = 1024


def _tau_in_kernel(bl_ref, bt_ref, lead_ref, tail_ref, wm_ref):
    """ln = basis @ coeffs (split precision) -> sigma -> quadrature tau,
    all VMEM-resident. Returns tau [L, NB] as a value."""
    f32 = jnp.float32
    # [nnode, NB] ln-sigma: f32 lead (HIGHEST: bf16-truncated f32 matmuls
    # are the documented 20-75% sigma error class on ln-space tables) +
    # one-pass bf16 tail accumulated in f32
    ln = jax.lax.dot_general(
        bl_ref[...], lead_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
    )
    ln = ln + jax.lax.dot_general(
        bt_ref[...], tail_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    sigma = jnp.exp(ln)
    # [L, NB] per-layer tau: the flat block-diagonal Lobatto quadrature
    # (rt.discretized.layer_tau_flat) — Wm carries dP, node weights,
    # 1e-4 Na/(g mu), and the concentration factor
    return jax.lax.dot_general(
        wm_ref[...], sigma, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
    )


def _fused_kernel(bl_ref, bt_ref, lead_ref, tail_ref, wm_ref, B_ref, mw_ref,
                  o_ref, *, L, nnode):
    """One nu block: ln = basis @ coeffs -> sigma -> tau -> TOA march."""
    f32 = jnp.float32
    tau = _tau_in_kernel(bl_ref, bt_ref, lead_ref, tail_ref, wm_ref)
    m = mw_ref[pl.ds(0, 8), :]
    W = mw_ref[pl.ds(8, 8), :]
    nb = tau.shape[1]
    I = jnp.broadcast_to(B_ref[pl.ds(L, 1), :], (8, nb)) \
        * jnp.ones((8, 1), f32)
    for l in range(L - 1, -1, -1):
        tl = tau[l:l + 1, :]
        b1 = B_ref[pl.ds(l + 1, 1), :]
        b2 = B_ref[pl.ds(l, 1), :]
        tm = tl * m
        t, omt, ratio = _trans_emit(tm)
        I = I * t + _layer_planck(b1, b2, t, omt, ratio)
    o_ref[pl.ds(0, 1), :] = jnp.sum(W * I, axis=0, keepdims=True)


def _fused_mono_kernel(bl_ref, bt_ref, lead_ref, tail_ref, wm_ref, B_ref,
                       S_ref, a_ref, mw_ref, c_ref,
                       tau_ref, md_ref, mu_ref, ms_ref, *, L, nnode,
                       beam_row):
    """One nu block: coefficients -> tau -> BOTH marches + stellar beam +
    Lambertian surface (the physics of rt.march_pallas._march_kernel with
    tau produced in-kernel instead of read from HBM). tau is also written
    out (callers return it in FluxPack)."""
    f32 = jnp.float32
    tau = _tau_in_kernel(bl_ref, bt_ref, lead_ref, tail_ref, wm_ref)
    tau_ref[...] = tau
    m = mw_ref[pl.ds(0, 8), :]
    W = mw_ref[pl.ds(8, 8), :]
    nb = tau.shape[1]
    c = c_ref[0, 0]
    inv_c = 1.0 / c
    # beam on a free stream sublane where available (rt.march_pallas)
    if beam_row is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        onehot = (row == beam_row).astype(f32)
        m_beam = m + onehot * (inv_c - m[beam_row:beam_row + 1, :])
    else:
        m_beam = m
    I = jnp.zeros((8, nb), dtype=f32)
    bm = c * S_ref[pl.ds(0, 1), :]
    for l in range(L):
        tl = tau[l:l + 1, :]
        b1 = B_ref[pl.ds(l, 1), :]
        b2 = B_ref[pl.ds(l + 1, 1), :]
        tm = tl * m_beam
        t, omt, ratio = _trans_emit(tm)
        I = I * t + _layer_planck(b1, b2, t, omt, ratio)
        if beam_row is not None:
            bm = bm * t[beam_row:beam_row + 1, :]
        else:
            bm = bm * jnp.exp(-tl * inv_c)
        e = jnp.sum(W * I, axis=0, keepdims=True)
        md_ref[pl.ds(l, 1), :] = e + bm
    M_surf_down = e + bm
    I_surf = M_surf_down * (a_ref[pl.ds(0, 1), :] * (1.0 / np.pi)) \
        + B_ref[pl.ds(L, 1), :]
    ms_ref[pl.ds(0, 1), :] = np.pi * I_surf
    I = jnp.broadcast_to(I_surf, (8, nb)) * jnp.ones((8, 1), f32)
    for l in range(L - 1, -1, -1):
        tl = tau[l:l + 1, :]
        b1 = B_ref[pl.ds(l + 1, 1), :]
        b2 = B_ref[pl.ds(l, 1), :]
        tm = tl * m
        t, omt, ratio = _trans_emit(tm)
        I = I * t + _layer_planck(b1, b2, t, omt, ratio)
        mu_ref[pl.ds(l, 1), :] = jnp.sum(W * I, axis=0, keepdims=True)


def fused_table_applicable(A) -> bool:
    """True when the absorber stack is exactly one split-precision Gas —
    the production table mode this fast path covers."""
    from ..absorption.gas import Gas
    from ..absorption.absorbers import AbsorberStack

    if isinstance(A, AbsorberStack):
        gases = getattr(A, "gases", None)
        if (gases is None or len(gases) != 1 or getattr(A, "cias", ())
                or getattr(A, "funs", ())):
            return False
        A = gases[0]
    return isinstance(A, Gas) and A.coeffs_tail is not None


def _state_basis(gas, Tq, Pq):
    """Chebyshev basis rows at the (T, P) states, pre-split into the gas's
    lead/tail column order (f32 / bf16)."""
    d = gas.domain
    BT = cheb_basis(Tq, d.Tmin, d.Tmax, d.nT)
    BP = cheb_basis(jnp.log(Pq), np.log(d.Pmin), np.log(d.Pmax), d.nP)
    basis = (BT[:, :, None] * BP[:, None, :]).reshape(Tq.shape[0], -1)
    bl = jnp.take(basis, jnp.asarray(np.asarray(gas.lead_idx)), axis=1)
    bt = jnp.take(basis, jnp.asarray(np.asarray(gas.tail_idx)), axis=1)
    return bl.astype(jnp.float32), bt.astype(jnp.bfloat16)


def _quad_matrix(P, g, mun, Cn, nlobatto, dtype):
    """The [L, L*nlobatto] Lobatto-quadrature matrix of layer_tau_flat with
    the per-node concentration folded in (sigma in the kernel is RAW)."""
    P = np.asarray(P, np.float64)
    L = P.shape[0] - 1
    k = nlobatto
    _, w = lobatto_unit_nodes(k)
    mask = np.zeros((L, L * k))
    for j in range(k):
        mask[np.arange(L), np.arange(L) * k + j] = w[j]
    dP = P[1:] - P[:-1]
    Wm = jnp.asarray(mask, dtype=dtype) * jnp.asarray(dP, dtype)[:, None]
    fac = (1e-4 * N_AVOGADRO / g) * Cn / mun
    return Wm * fac[None, :].astype(dtype)


def table_olr_fused_ref(gas, P, g, fT, fmu, nlobatto: int, nstream: int,
                        B=None):
    """Unfused XLA twin (oracle + JVP tangent path): identical math through
    the standard split-precision raw_sigma -> layer_tau_flat -> OLR scan."""
    from .discretized import layer_tau_flat
    from ..ops.planck import planck

    P = jnp.asarray(P)
    Pn = lobatto_pressures(P, nlobatto).reshape(-1)
    Tn = fT(Pn)
    sig = gas.raw_sigma(Tn, Pn)
    mun = jax.vmap(fmu)(Tn, Pn) * jnp.ones_like(Pn)
    Cn = jnp.asarray(gas.fC(Tn, Pn)) * jnp.ones_like(Pn)
    tau = layer_tau_flat(P, mun / Cn, sig, g, nlobatto)
    if B is None:
        Tlev = fT(P)
        B = planck(gas.nu[None, :], Tlev[:, None])
    return _olr_scan(tau, B, nstream)


def table_olr_fused(gas, P, g, fT, fmu, nlobatto: int = 3, nstream: int = 5,
                    interpret: bool = False, block_n: int = BLOCK_N):
    """Outgoing monochromatic flux [n_nu] for a split-precision table gas via
    the fully-fused kernel. Same contract as composing ``_column_tau`` +
    ``_planck_levels`` + ``outgoing_flux`` (rt.fluxes.outgoing semantics,
    ref fluxes.jl:133-158) for a single-gas absorber."""
    from ..ops.planck import planck

    if gas.coeffs_tail is None:
        raise ValueError("table_olr_fused needs a split-precision Gas "
                         "(gas.split_precision(k))")
    P = jnp.asarray(P)
    L = P.shape[0] - 1
    if not (1 <= L <= MAX_LAYERS):
        raise ValueError(f"fused table OLR needs 1 <= L <= {MAX_LAYERS}")
    Pn = lobatto_pressures(P, nlobatto).reshape(-1)
    Tn = fT(Pn)
    bl, bt = _state_basis(gas, Tn, Pn)
    mun = jax.vmap(fmu)(Tn, Pn) * jnp.ones_like(Pn)
    Cn = jnp.asarray(gas.fC(Tn, Pn)) * jnp.ones_like(Pn)
    quad = _quad_matrix(P, g, mun, Cn, nlobatto, jnp.float32)
    Tlev = fT(P)
    B = planck(gas.nu[None, :], Tlev[:, None])
    return _fused_call(gas.coeffs, gas.coeffs_tail, (bl, bt), quad, B,
                       nstream, interpret, block_n)


@partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7))
def _fused_call(lead, tail, basis_pair, quad, B, nstream, interpret, block_n):
    bl, bt = basis_pair
    L = quad.shape[0]
    nnode = quad.shape[1]
    N = lead.shape[1]
    dt = jnp.float32
    m, W = stream_nodes(nstream)
    mw = jnp.asarray(pack_mw(m, W), dt)
    Np = -(-N // block_n) * block_n
    pad = Np - N
    if pad:
        lead = jnp.pad(lead, ((0, 0), (0, pad)))
        tail = jnp.pad(tail, ((0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, pad)))
    grid = (Np // block_n,)
    blk = lambda r: pl.BlockSpec((r, block_n), lambda i: (0, i))
    fix = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    out = pl.pallas_call(
        partial(_fused_kernel, L=L, nnode=nnode),
        grid=grid,
        in_specs=[
            fix(nnode, bl.shape[1]), fix(nnode, bt.shape[1]),
            blk(bl.shape[1]), blk(bt.shape[1]),
            fix(L, nnode), blk(L + 1), fix(16, 1),
        ],
        out_specs=blk(1),
        out_shape=jax.ShapeDtypeStruct((1, Np), dt),
        interpret=interpret,
    )(bl.astype(jnp.float32), bt, lead.astype(jnp.float32), tail,
      quad.astype(dt), B.astype(dt), mw)
    return out[0, :N]


@_fused_call.defjvp
def _fused_call_jvp(nstream, interpret, block_n, primals, tangents):
    """Tangents ride the unfused XLA pipeline: rebuild ln -> sigma -> tau ->
    OLR scan from the same operands (mathematically identical)."""

    def unfused(lead, tail, basis_pair, quad, B):
        tau = _unfused_tau(lead, tail, basis_pair, quad)
        return _olr_scan(tau, B.astype(jnp.float32), nstream)

    return jax.jvp(unfused, primals, tangents)


def _unfused_tau(lead, tail, basis_pair, quad):
    """XLA twin of :func:`_tau_in_kernel` (oracle + JVP tangent path)."""
    bl, bt = basis_pair
    acc = jnp.float32
    ln = jnp.matmul(bl.astype(acc), lead.astype(acc),
                    precision=jax.lax.Precision.HIGHEST)
    ln = ln + jnp.matmul(bt.astype(acc), tail.astype(acc),
                         precision=jax.lax.Precision.HIGHEST)
    sigma = jnp.exp(ln)
    return jnp.matmul(quad.astype(acc), sigma,
                      precision=jax.lax.Precision.HIGHEST)


def table_monoflux_fused(gas, P, g, fT, fmu, S_nu, albedo_nu, theta_s,
                         nlobatto: int = 3, nstream: int = 5,
                         interpret: bool = False, block_n: int = BLOCK_N):
    """(M_up, M_down, tau) for a split-precision table gas via the fully
    fused coefficients -> tau -> both-marches kernel (the table-mode
    ``monochromatic_fluxes`` fast path; ref fluxes.jl:195-306 semantics with
    the working march of discretized.jl:249-326)."""
    from ..ops.planck import planck

    if gas.coeffs_tail is None:
        raise ValueError("table_monoflux_fused needs a split-precision Gas")
    P = jnp.asarray(P)
    L = P.shape[0] - 1
    if not (1 <= L <= MAX_LAYERS):
        raise ValueError(f"fused table monoflux needs 1 <= L <= {MAX_LAYERS}")
    Pn = lobatto_pressures(P, nlobatto).reshape(-1)
    Tn = fT(Pn)
    bl, bt = _state_basis(gas, Tn, Pn)
    mun = jax.vmap(fmu)(Tn, Pn) * jnp.ones_like(Pn)
    Cn = jnp.asarray(gas.fC(Tn, Pn)) * jnp.ones_like(Pn)
    quad = _quad_matrix(P, g, mun, Cn, nlobatto, jnp.float32)
    Tlev = fT(P)
    B = planck(gas.nu[None, :], Tlev[:, None])
    ctheta = jnp.cos(jnp.asarray(theta_s, jnp.float32))
    return _fused_mono_call(gas.coeffs, gas.coeffs_tail, (bl, bt), quad, B,
                            S_nu, albedo_nu, ctheta, nstream, interpret,
                            block_n)


@partial(jax.custom_jvp, nondiff_argnums=(8, 9, 10))
def _fused_mono_call(lead, tail, basis_pair, quad, B, S_nu, albedo_nu,
                     ctheta, nstream, interpret, block_n):
    bl, bt = basis_pair
    L = quad.shape[0]
    nnode = quad.shape[1]
    N = lead.shape[1]
    dt = jnp.float32
    m, W = stream_nodes(nstream)
    nst = len(m)
    mw = jnp.asarray(pack_mw(m, W), dt)
    Np = -(-N // block_n) * block_n
    pad = Np - N
    if pad:
        lead = jnp.pad(lead, ((0, 0), (0, pad)))
        tail = jnp.pad(tail, ((0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, pad)))
        S_nu = jnp.pad(S_nu, (0, pad))
        albedo_nu = jnp.pad(albedo_nu, (0, pad))
    S2 = S_nu[None, :].astype(dt)
    a2 = albedo_nu[None, :].astype(dt)
    c2 = jnp.reshape(ctheta.astype(dt), (1, 1))
    grid = (Np // block_n,)
    blk = lambda r: pl.BlockSpec((r, block_n), lambda i: (0, i))
    fix = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    tau, md, mu, ms = pl.pallas_call(
        partial(_fused_mono_kernel, L=L, nnode=nnode,
                beam_row=nst if nst <= 7 else None),
        grid=grid,
        in_specs=[
            fix(nnode, bl.shape[1]), fix(nnode, bt.shape[1]),
            blk(bl.shape[1]), blk(bt.shape[1]),
            fix(L, nnode), blk(L + 1), blk(1), blk(1),
            fix(16, 1), fix(1, 1),
        ],
        out_specs=[blk(L), blk(L), blk(L), blk(1)],
        out_shape=[
            jax.ShapeDtypeStruct((L, Np), dt),
            jax.ShapeDtypeStruct((L, Np), dt),
            jax.ShapeDtypeStruct((L, Np), dt),
            jax.ShapeDtypeStruct((1, Np), dt),
        ],
        interpret=interpret,
    )(bl.astype(jnp.float32), bt, lead.astype(jnp.float32), tail,
      quad.astype(dt), B.astype(dt), S2, a2, mw, c2)
    M_up = jnp.concatenate([mu, ms], axis=0)[:, :N]
    beam_top = (c2[0, 0] * S2)[:, :]
    M_down = jnp.concatenate([beam_top, md], axis=0)[:, :N]
    return M_up, M_down, tau[:, :N]


@_fused_mono_call.defjvp
def _fused_mono_jvp(nstream, interpret, block_n, primals, tangents):
    """Tangents ride the unfused XLA pipeline (scan monoflux twin)."""
    from .discretized import _monoflux_scan

    def unfused(lead, tail, basis_pair, quad, B, S_nu, albedo_nu, ctheta):
        tau = _unfused_tau(lead, tail, basis_pair, quad)
        up, dn = _monoflux_scan(tau, B.astype(jnp.float32),
                                S_nu.astype(jnp.float32),
                                albedo_nu.astype(jnp.float32),
                                ctheta.astype(jnp.float32), nstream)
        return up, dn, tau

    return jax.jvp(unfused, primals, tangents)
