"""Pallas TPU kernel for the block-banded line-sum (the hot op).

Same contraction as :mod:`clearsky_tpu.ops.linesum` (the jnp correctness
oracle): for every wavenumber block, accumulate TIPS-scaled line profiles from
the block's contiguous line slab. The Pallas version tiles the work onto the
VPU explicitly:

  * grid = (n_blocks, n_states): each program owns one [block] stripe of the
    output for one (T, P) state — output blocks are disjoint, no accumulation
    races, trivially parallel over TPU cores.
  * the line slab streams through VMEM in chunks of ``CHUNK`` lines; the
    [block x CHUNK] profile tile is pure fused VPU arithmetic (the branch-free
    Humlicek Faddeeva from ``ops.faddeeva`` inlines directly).
  * line-window banding (ref ClearSky.jl line_shapes.jl:10-22,53-87) is
    enforced by masks: slab overhang via the per-block line count, profile
    truncation via |dnu| <= cut.

Per-line parameters (S, alpha, gamma) are computed once in XLA on device
[n_states, n_lines] and gathered into per-block slabs host-shape-statically —
the kernel reads dense [1, 1, slab] rows, no gathers inside.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .faddeeva import wofz_re_kernel as wofz_re
from .lineshape import chi_phco2
from .linesum import (
    LineWindowPlan,
    DeviceWindowPlan,
    _line_params,
    sigma_from_lines,
    sigma_from_lines_device,
)
from ..spectra.lines import PER_LINE_FIELDS as _PER_LINE_FIELDS

__all__ = [
    "sigma_from_lines_pallas",
    "sigma_from_lines_pallas_device",
    "sigma_from_lines_pallas_jvp",
    "sigma_from_lines_pallas_device_jvp",
]

_SQRT_LN2 = 0.8325546111576977
_SQRT_PI = 1.7724538509055159

CHUNK = 128  # lines per inner VMEM tile


def _profile_tile(shape: str, dnu, S, alpha, gamma, T):
    """sigma contribution of a [block, chunk] tile; elementwise VPU math.

    (A tile-level Humlicek region-1 fast path was tried and reverted: the
    diagonal structure of the slabs means nearly every tile touches a line
    core, so the tile-min predicate almost never fires and the cond is pure
    overhead.)
    """
    # alpha/gamma/S are per-line rows [1, chunk]; reciprocals there cost
    # chunk divisions instead of block*chunk broadcast divisions
    if shape in ("voigt", "phco2", "voigt_ref", "phco2_ref"):
        # 1/e-width Voigt convention, matching ops.lineshape.fvoigt; the
        # *_ref shapes reproduce the reference's HWHM-convention formula
        # (= alpha/sqrt(ln2), see ops.linesum.PROFILES)
        g = gamma * chi_phco2(dnu, T) if shape.startswith("phco2") else gamma
        alpha = alpha * (1.0 / _SQRT_LN2) if shape.endswith("_ref") else alpha
        ia = 1.0 / alpha
        x = dnu * ia
        y = g * ia
        return (S * (1.0 / _SQRT_PI) * ia) * wofz_re(x, y)
    if shape == "lorentz":
        return S * (gamma / np.pi) / (dnu * dnu + gamma * gamma)
    if shape == "doppler":
        ia = 1.0 / alpha
        arg = dnu * ia
        return (S * (1.0 / _SQRT_PI) * ia) * jnp.exp(-arg * arg)
    raise ValueError(f"unknown line shape {shape!r}")


# shapes eligible for the near/far Humlicek split in the grouped kernel
_SPLIT_SHAPES = ("voigt", "phco2", "voigt_ref", "phco2_ref")


def _profile_far(shape, dnu, S, alpha, gamma, T):
    """Far-wing Voigt tile: Humlicek region 1 only (~20 flops/eval).

    Valid whenever s = |x| + y >= 15, which the caller guarantees
    structurally: the grouped kernel's far sweep masks to |dnu| > d_near with
    d_near = 15 * max(alpha), so |x| = |dnu|/alpha >= 15 for every unmasked
    element regardless of the (pressure-dependent) y. Only the real part of
    w1 = 0.5641896 t/(0.5 + t^2) is formed. Where the full `wofz_re` would
    instead take the y < 0.01 small-y repair, the two forms agree to
    O(x^-4) <= 2e-5 rel at |x| >= 15 — inside the kernel's 2.4e-4 class
    (measured max rel delta 2.6e-5 on the CO2 fixture A/B).

    (A tile-level `lax.cond` dispatch between this and the full w4 was tried
    first and measured 2.4-3x SLOWER than no fast path at all — Mosaic scalar
    conds break the loop pipeline. The split must be branch-free, hence the
    two-sweep structure in `_kernel_resident_grouped`.)
    """
    g = gamma * chi_phco2(dnu, T) if shape.startswith("phco2") else gamma
    alpha = alpha * (1.0 / _SQRT_LN2) if shape.endswith("_ref") else alpha
    ia = 1.0 / alpha
    x = dnu * ia
    y = g * ia
    # Re[0.5641896 (y - ix) / (0.5 + (y - ix)^2)], real arithmetic only.
    # Two-division form matters here too (see faddeeva._cdiv): d2 ~ |z|^4
    # stays finite in f32 up to |x| ~ 1e9, far beyond any cut/alpha ratio.
    t2r = y * y - x * x
    t2i = -2.0 * x * y
    br = 0.5 + t2r
    d2 = br * br + t2i * t2i
    wr = 0.5641896 * (y * br - x * t2i) / d2
    return (S * (1.0 / _SQRT_PI) * ia) * wr


def _kernel(shape, slab_pad, cut, n_states, nu_b_ref, nu_b_lo_ref, nul_ref,
            nul_lo_ref, S_ref, a_ref, g_ref, cnt_ref, T_ref, out_ref):
    """One program per wavenumber block, all states fused.

    Fusing the state loop into the program (instead of a grid axis) shares the
    slab DMA, the dnu tile, and the window mask across all states, and cuts
    the program count (and per-program pipeline overhead) by n_states.
    """
    B = nu_b_ref.shape[-1]
    # layout note: grid points on sublanes, the line chunk on lanes. A naive
    # lines-on-sublanes variant (per-group lane->sublane relayouts of the
    # parameter rows) measured 34% slower; _kernel_resident_grouped gets that
    # orientation's 16x finer work granularity WITHOUT the per-group relayout
    # cost by transposing one packed parameter matrix per chunk through a
    # scratch ref — it is the default resident strategy (4.95x this one).
    nu_b = nu_b_ref[0, 0, :].reshape(B, 1)
    nu_b_lo = nu_b_lo_ref[0, 0, :].reshape(B, 1)
    cnt = cnt_ref[pl.program_id(0), 0]
    acc0 = jnp.zeros((n_states, B), jnp.float32)

    def body(c, acc):
        o = c * CHUNK
        nul = nul_ref[0, 0, pl.ds(o, CHUNK)].reshape(1, CHUNK)
        nul_lo = nul_lo_ref[0, 0, pl.ds(o, CHUNK)].reshape(1, CHUNK)
        # two-float dnu: the hi difference is exact for nearby values
        # (Sterbenz) and the f32 position residuals restore ~1e-7 cm^-1
        # accuracy that raw f32 positions (~1e-4 rounding) cannot deliver
        dnu = (nu_b - nul) + (nu_b_lo - nul_lo)  # [B, CHUNK], shared
        offs = o + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        mask = (offs < cnt) & (jnp.abs(dnu) <= cut)
        rows = []
        for st in range(n_states):             # static unroll
            S = S_ref[st, 0, 0, pl.ds(o, CHUNK)].reshape(1, CHUNK)
            al = a_ref[st, 0, 0, pl.ds(o, CHUNK)].reshape(1, CHUNK)
            ga = g_ref[st, 0, 0, pl.ds(o, CHUNK)].reshape(1, CHUNK)
            f = _profile_tile(shape, dnu, S, al, ga, T_ref[st, 0])
            rows.append(jnp.sum(jnp.where(mask, f, 0.0), axis=1))
        return acc + jnp.stack(rows)

    # dynamic trip count: only walk the chunks this block's line count reaches.
    # Counts vary 40x between band heads and sparse spectral regions — this
    # skip is the structural advantage over the XLA path, which must always
    # process the worst-case slab.
    nchunks = (cnt + CHUNK - 1) // CHUNK
    acc = jax.lax.fori_loop(0, nchunks, body, acc0)
    out_ref[:, 0, 0, :] = acc


def _kernel_resident(shape, cut, n_states, nu_b_ref, nu_b_lo_ref, nul_ref,
                     nul_lo_ref, S_ref, a_ref, g_ref, start_ref, cnt_ref,
                     T_ref, out_ref):
    """Resident-catalog variant: the full per-line arrays live in VMEM and each
    block slices its contiguous window dynamically.

    Removes the XLA-side slab gather entirely — the banding slabs are
    contiguous index ranges (the whole point of the plan), so materializing
    them as gathered copies cost ~75% of the kernel's wall clock.
    """
    B = nu_b_ref.shape[-1]
    nu_b = nu_b_ref[0, 0, :].reshape(B, 1)
    nu_b_lo = nu_b_lo_ref[0, 0, :].reshape(B, 1)
    b = pl.program_id(0)
    start = start_ref[b, 0]  # CHUNK-aligned by construction (host-side)
    cnt = cnt_ref[b, 0]
    acc0 = jnp.zeros((n_states, B), jnp.float32)

    def body(c, acc):
        # lane-dimension dynamic slices must be provably 128-aligned on TPU;
        # the plan aligns starts down to CHUNK multiples (the |dnu| <= cut
        # mask makes the extra leading lines inert)
        o = pl.multiple_of(start + c * CHUNK, CHUNK)
        nul = nul_ref[0, pl.ds(o, CHUNK)].reshape(1, CHUNK)
        nul_lo = nul_lo_ref[0, pl.ds(o, CHUNK)].reshape(1, CHUNK)
        dnu = (nu_b - nul) + (nu_b_lo - nul_lo)  # two-float, see _kernel
        local = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        mask = (local < cnt) & (jnp.abs(dnu) <= cut)
        rows = []
        for st in range(n_states):             # static unroll
            S = S_ref[st, pl.ds(o, CHUNK)].reshape(1, CHUNK)
            al = a_ref[st, pl.ds(o, CHUNK)].reshape(1, CHUNK)
            ga = g_ref[st, pl.ds(o, CHUNK)].reshape(1, CHUNK)
            f = _profile_tile(shape, dnu, S, al, ga, T_ref[st, 0])
            rows.append(jnp.sum(jnp.where(mask, f, 0.0), axis=1))
        return acc + jnp.stack(rows)

    nchunks = (cnt + CHUNK - 1) // CHUNK
    acc = jax.lax.fori_loop(0, nchunks, body, acc0)
    out_ref[:, 0, 0, :] = acc


def _smoothstep_d2(D, A1, A2):
    """C^2 smootherstep in squared distance: 0 below A1, 1 above A2.

    The switching weight of the coarse-far split (see `_pallas_sigma_coarse`):
    evaluated on the shared D = dnu^2 tile, so the ~8 vreg-ops are paid once
    per line group, not per state."""
    w = jnp.clip((D - A1) * (1.0 / (A2 - A1)), 0.0, 1.0)
    return w * w * w * (10.0 + w * (-15.0 + 6.0 * w))


def _kernel_resident_grouped(shape, cut, n_states, n_params, split, lgroup,
                             pret, wmode, nu_b_ref, nu_b_lo_ref, Pk_ref,
                             scal_ref, dnear_ref, T_ref, out_ref, Pt_ref=None):
    """Sublane-grouped resident variant: points on LANES, line groups on
    SUBLANES.

    The lane-major kernel's minimum work is one 128-line chunk per point
    block; on sparse spectral regions (median 8 in-window lines per block on
    the CO2 fixture) ~90% of its dense evaluations are masked padding. Here
    the line axis advances in groups of ``lgroup`` on sublanes, so per-block
    work is ceil(cnt/lgroup)*lgroup lines — ~4.6x fewer dense evals on the
    bench grid (lgroup=8; hardware sweep showed larger groups lose more to
    quantization than they gain in loop amortization).

    Two pack layouts, chosen statically by ``pret`` (measured within ~10%
    of each other; each wins somewhere, so the dispatcher picks per shape):

      * ``pret=True``: the parameter matrix arrives PRE-TRANSPOSED from XLA
        as Pk[n_lines_pad, n_params] — lines on sublanes — so each group is
        one 8-aligned sublane slice; no in-kernel relayouts at all, at the
        cost of lane-padding n_params to a 128 multiple in VMEM. Fastest
        for the dense phco2 windows and the single-sweep shapes (+9% over
        chunked on the CO2 bench).
      * ``pret=False``: lane-major Pk[n_params, n_lines_pad]; each 128-line
        chunk is transposed once into the Pt scratch and groups slice the
        scratch. Fastest for the split voigt sweep pair (+10% over pret on
        the CO2 bench — mechanism unclear, empirically robust).

    The kernel is vector-ALU-issue bound (probe decomposition in
    scripts/probe_kernel_overhead.py), so parameter rows carry values
    PRECOMPUTED in XLA to minimize in-loop vreg-ops — note [lgroup, 1]
    "scalar" arithmetic occupies a full vreg op just like [lgroup, B], so
    per-(state, line) prep must happen at pack time, not in the loop:

      * Voigt-family shapes pack (Sia, ia, y0) = (S*ia/sqrt(pi), 1/alpha,
        gamma/alpha) per state — the full-w4 near tile needs no division —
        plus, for voigt/voigt_ref, far-wing coefficients (A, c1, c2, k2) =
        (ia^2, 0.5+y0^2, 4*y0^2*A, S*gamma*A/pi): Humlicek region 1 in the
        shared D = dnu^2 collapses to k2*(c1+m)/((c1-m)^2 + c2*D) with
        m = D*A — 5 vreg-ops + 1 divide per state per tile. (The reference
        convention *_ref folds its alpha/sqrt(ln2) rescale into ia at pack
        time.) phco2's chi(dnu, T) factor is dnu-dependent, so its far tile
        keeps the explicit region-1 form on (Sia, ia, y0).
      * lorentz/doppler pack raw (S, alpha, gamma) and use `_profile_tile`.

    With ``split`` (Voigt-family shapes), the window is swept twice,
    branch-free: a FAR sweep over the whole slab with the region-1 profile
    masked to |dnu| > d_near, and a NEAR sweep over the tiny
    [start2, start2+cnt2) sub-slab with the full w4 profile masked to
    |dnu| <= d_near. d_near = 15*max(alpha) guarantees s = |x|+y >= 15 for
    every far element (see `_profile_far`); the strict >/<= masks on the
    SAME two-float dnu make the split exact. Accumulators are [lgroup, B]
    per state (same vreg count as [1, B] at B=128) so the sublane reduction
    happens once per block instead of once per group iteration.

    Per-block scalars are PACKED into one SMEM row scal[b] =
    (start, cnt, start2, cnt2): SMEM windows cost ~512 B per row regardless
    of width, so four separate [seg, 1] arrays blow the 1 MB SMEM budget at
    SEG=512 while one [seg, 4] array costs a quarter of it.
    """
    B = nu_b_ref.shape[-1]
    nu_b = nu_b_ref[0, 0, :].reshape(1, B)
    nu_b_lo = nu_b_lo_ref[0, 0, :].reshape(1, B)
    b = pl.program_id(0)
    LG = lgroup
    ia_pack = shape in _SPLIT_SHAPES
    voigt_far = split and shape in ("voigt", "voigt_ref")
    # farall (stencil-near) voigt never runs the w4 tile, so its pack
    # carries only the 4 far coefficients (slim pack, see _grouped_pack)
    slim = (voigt_far and wmode is not None and wmode[0] == "farall"
            and n_params == 4 * n_states + 2)
    stride = (4 if slim else 7) if voigt_far else 3
    far_off = 0 if slim else 3
    is_phco2 = shape.startswith("phco2")
    # per-state accumulators as a tuple carry: .at[...].add on a stacked
    # array lowers to scatter-add, which Mosaic does not implement
    acc0 = tuple(jnp.zeros((LG, B), jnp.float32) for _ in range(n_states))
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (LG, 1), 0)

    def tile_near(rows, dnu, mask, acc, wgt=None):
        """Full-accuracy tile: w4 Faddeeva (ia pack) or `_profile_tile`.

        ``wgt`` (coarse-far fine pass) weights the w4 zone by 1-W too, so the
        partition stays exact even if the traced d_near reaches into the
        switch ramp (no double count against the coarse field)."""
        new = []
        for st in range(n_states):             # static unroll
            b0 = 2 + stride * st
            if ia_pack:
                Sia = rows[:, b0 : b0 + 1]
                ia = rows[:, b0 + 1 : b0 + 2]
                y0 = rows[:, b0 + 2 : b0 + 3]
                y = y0 * chi_phco2(dnu, T_ref[st, 0]) if is_phco2 else y0
                f = Sia * wofz_re(dnu * ia, y)
            else:
                S = rows[:, b0 : b0 + 1]
                al = rows[:, b0 + 1 : b0 + 2]
                ga = rows[:, b0 + 2 : b0 + 3]
                f = _profile_tile(shape, dnu, S, al, ga, T_ref[st, 0])
            if wgt is not None:
                f = f * wgt
            new.append(acc[st] + jnp.where(mask, f, 0.0))
        return tuple(new)

    def tile_far(rows, dnu, mask, acc, wgt=None):
        """Far-wing tile: Humlicek region 1 (see `_profile_far` for validity).

        Masked-out lanes may produce inf/NaN (the 1e30 pad sentinel squares
        past f32 max) — the select discards them before accumulation.
        ``wgt`` (coarse-far split) is a shared [LG, B] switching weight.
        """
        new = []
        if voigt_far:
            D = dnu * dnu                      # shared across states
            for st in range(n_states):
                b0 = 2 + stride * st + far_off
                A = rows[:, b0 : b0 + 1]
                c1 = rows[:, b0 + 1 : b0 + 2]
                c2 = rows[:, b0 + 2 : b0 + 3]
                k2 = rows[:, b0 + 3 : b0 + 4]
                m = D * A
                br = c1 - m
                f = (k2 * (c1 + m)) / (br * br + c2 * D)
                if wgt is not None:
                    f = f * wgt
                new.append(acc[st] + jnp.where(mask, f, 0.0))
        else:  # phco2 family: chi is dnu-dependent, explicit region-1 form
            for st in range(n_states):
                b0 = 2 + 3 * st
                Sia = rows[:, b0 : b0 + 1]
                ia = rows[:, b0 + 1 : b0 + 2]
                y0 = rows[:, b0 + 2 : b0 + 3]
                y = y0 * chi_phco2(dnu, T_ref[st, 0])
                x = dnu * ia
                t2r = y * y - x * x
                t2i = -2.0 * x * y
                br = 0.5 + t2r
                d2 = br * br + t2i * t2i
                wr = 0.5641896 * (y * br - x * t2i) / d2
                f = Sia * wr
                if wgt is not None:
                    f = f * wgt
                new.append(acc[st] + jnp.where(mask, f, 0.0))
        return tuple(new)

    def group_step(rows, local, end, mask_fn, tile_fn, acc, wfn=None):
        nul = rows[:, 0:1]
        nul_lo = rows[:, 1:2]
        dnu = (nu_b - nul) + (nu_b_lo - nul_lo)   # [LG, B] two-float
        mask = (local < end) & mask_fn(jnp.abs(dnu))
        wgt = None if wfn is None else wfn(dnu * dnu)  # shared across states
        return tile_fn(rows, dnu, mask, acc, wgt)

    def sweep_pret(start, cnt, tile_fn, mask_fn, acc, wfn=None):
        # sublane-dim dynamic slices need 8-multiple offsets; LG is a
        # multiple of 8 and start aligns down to LG, so every group offset
        # is provably aligned. Lead-in lines from the alignment are outside
        # every point's window (start was the searchsorted lower bound), so
        # the |dnu| mask kills them — same invariant the lane kernel uses.
        start_al = pl.multiple_of((start // LG) * LG, LG)
        off = start - start_al              # < LG
        # empty windows must stay empty: the alignment slack alone would
        # otherwise walk one fully-masked group (common in the near sweep,
        # where most blocks have no core-region lines)
        end = jnp.where(cnt == 0, 0, off + cnt)  # last local line (exclusive)

        def group_body(g, acc):
            o = pl.multiple_of(start_al + g * LG, LG)
            rows = Pk_ref[pl.ds(o, LG), :]            # [LG, n_params]
            return group_step(rows, g * LG + iota_g, end, mask_fn, tile_fn,
                              acc, wfn)

        ngroups = (end + LG - 1) // LG
        return jax.lax.fori_loop(0, ngroups, group_body, acc)

    def sweep_chunked(start, cnt, tile_fn, mask_fn, acc, wfn=None):
        start_al = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
        off = start - start_al              # < CHUNK
        end = jnp.where(cnt == 0, 0, off + cnt)

        def chunk_body(c, acc):
            o = pl.multiple_of(start_al + c * CHUNK, CHUNK)
            # one relayout per chunk, staged through a scratch ref so the
            # group loop below can take 8-aligned dynamic sublane slices
            # (Mosaic lowers pl.ds on refs; dynamic_slice on values is
            # unimplemented)
            Pt_ref[:, :] = Pk_ref[:, pl.ds(o, CHUNK)].T  # [CHUNK, n_params]
            g_lo = jnp.maximum(0, (off - c * CHUNK)) // LG
            g_hi = jnp.minimum(CHUNK // LG, (end - c * CHUNK + LG - 1) // LG)

            def group_body(g, acc):
                rows = Pt_ref[pl.ds(pl.multiple_of(g * LG, LG), LG), :]
                local = c * CHUNK + g * LG + iota_g
                return group_step(rows, local, end, mask_fn, tile_fn, acc, wfn)

            return jax.lax.fori_loop(g_lo, g_hi, group_body, acc)

        nchunks = (end + CHUNK - 1) // CHUNK
        return jax.lax.fori_loop(0, nchunks, chunk_body, acc)

    sweep = sweep_pret if pret else sweep_chunked

    start = scal_ref[b, 0]
    cnt = scal_ref[b, 1]
    if wmode is not None and wmode[0] == "fine":
        # coarse-far split, fine pass (see `_pallas_sigma_coarse`): the mid
        # zone carries weight 1-W (support |dnu| <= 2*d_far = cutF), the near
        # zone the full w4, and two thin annulus slabs at the outer cut carry
        # 1-Wout = smoothstep(D; R1, R2) so the hard truncation at `cut`
        # stays EXACT while the coarse field only holds the smooth part.
        _, D1, D2, R1, R2, cutF = wmode
        d_near = dnear_ref[0, 0]
        one_minus_w = lambda D: 1.0 - _smoothstep_d2(D, D1, D2)
        acc = sweep(
            start, cnt, tile_far,
            lambda adnu: (adnu <= cutF) & (adnu > d_near), acc0,
            wfn=one_minus_w,
        )
        acc = sweep(
            scal_ref[b, 2], scal_ref[b, 3], tile_near,
            lambda adnu: adnu <= d_near, acc, wfn=one_minus_w,
        )
        ann_mask = lambda adnu: (adnu <= cut) & (adnu * adnu > R1)
        ann_w = lambda D: _smoothstep_d2(D, R1, R2)
        acc = sweep(scal_ref[b, 4], scal_ref[b, 5], tile_far, ann_mask, acc,
                    wfn=ann_w)
        acc = sweep(scal_ref[b, 6], scal_ref[b, 7], tile_far, ann_mask, acc,
                    wfn=ann_w)
    elif wmode is not None and wmode[0] == "farall":
        # stencil-near variant (strategy="stencil"): the cheap region-1
        # profile rides the WHOLE window (no inner hole), and the w4-vs-
        # region-1 difference is added back in XLA at the few grid points
        # within each line's |x| <= 15 core (see _stencil_near_correction).
        # Because the XLA pass adds a *correction*, mask-boundary rounding
        # between the two passes costs at most the region-1 error itself.
        acc = sweep(start, cnt, tile_far, lambda adnu: adnu <= cut, acc0)
    elif wmode is not None and wmode[0] == "fine_stencil":
        # coarse-far fine pass, stencil-near variant: the (1-W)-weighted
        # region-1 mid sweep rides the whole <= cutF window (no near hole,
        # no in-kernel w4 sweep); the XLA stencil pass adds the
        # (1-W)-weighted w4-r1 near-core correction (_stencil_apply with
        # weight=(D1, D2)). Annulus slabs keep the hard cut exact.
        _, D1, D2, R1, R2, cutF = wmode
        one_minus_w = lambda D: 1.0 - _smoothstep_d2(D, D1, D2)
        acc = sweep(
            start, cnt, tile_far,
            lambda adnu: adnu <= cutF, acc0,
            wfn=one_minus_w,
        )
        ann_mask = lambda adnu: (adnu <= cut) & (adnu * adnu > R1)
        ann_w = lambda D: _smoothstep_d2(D, R1, R2)
        acc = sweep(scal_ref[b, 4], scal_ref[b, 5], tile_far, ann_mask, acc,
                    wfn=ann_w)
        acc = sweep(scal_ref[b, 6], scal_ref[b, 7], tile_far, ann_mask, acc,
                    wfn=ann_w)
    elif wmode is not None and wmode[0] == "coarse":
        # coarse-far split, coarse pass: one region-1 sweep of the whole
        # window weighted by W*Wout (smooth in nu, so the result can be
        # interpolated back to the fine grid)
        _, D1, D2, R1, R2, d_lo = wmode
        acc = sweep(
            start, cnt, tile_far,
            lambda adnu: (adnu <= cut) & (adnu > d_lo), acc0,
            wfn=lambda D: _smoothstep_d2(D, D1, D2)
            * (1.0 - _smoothstep_d2(D, R1, R2)),
        )
    elif split:
        d_near = dnear_ref[0, 0]
        acc = sweep(
            start, cnt, tile_far,
            lambda adnu: (adnu <= cut) & (adnu > d_near), acc0,
        )
        acc = sweep(
            scal_ref[b, 2], scal_ref[b, 3], tile_near,
            lambda adnu: adnu <= d_near, acc,
        )
    else:
        acc = sweep(start, cnt, tile_near, lambda adnu: adnu <= cut, acc0)
    for st in range(n_states):
        out_ref[st, 0, 0, :] = jnp.sum(acc[st], axis=0)


# VMEM budget for keeping the whole line catalog resident (bytes); beyond
# this the static-plan wrapper splits the catalog into resident-sized
# segments (see _segment_cap / sigma_from_lines_pallas) and only the
# device-plan (sharded) path falls back to XLA-gathered slabs.
_RESIDENT_VMEM_LIMIT = 6 * 2**20


def _grouped_pack(shape, S, alpha, gamma, nu_l, nu_l_lo, n_lines_pad,
                  rows_per_state, pret):
    """Assemble the grouped kernel's resident parameter pack.

    Layout contract of `_kernel_resident_grouped`: rows 0-1 are the two-float
    line positions; per state, `rows_per_state` precomputed profile scalars
    follow (see the kernel docstring). Returns (Pk, n_params) with Pk
    pre-transposed to [n_lines_pad, n_params] when ``pret``.
    """
    n_states, n_lines = S.shape
    pad_n = n_lines_pad - n_lines

    def row(vals, pad):
        return jnp.concatenate(
            [vals, jnp.full((n_states, pad_n), pad, jnp.float32)], axis=1
        )

    nul_full = jnp.concatenate([nu_l, jnp.full((pad_n,), 1e30, jnp.float32)])[None, :]
    nul_lo_full = jnp.concatenate([nu_l_lo, jnp.zeros((pad_n,), jnp.float32)])[None, :]
    if shape in _SPLIT_SHAPES:
        # precompute per-(state, line) profile scalars in XLA: the kernel
        # loop is vector-ALU bound, and even [lgroup, 1] arithmetic costs
        # full vreg ops there (see _kernel_resident_grouped docstring).
        # The *_ref reference convention (alpha -> alpha/sqrt(ln2)) folds
        # into ia here, so the in-kernel profiles are convention-free.
        a_eff = alpha * (1.0 / _SQRT_LN2) if shape.endswith("_ref") else alpha
        ia = 1.0 / a_eff
        Sia = S * ia * (1.0 / _SQRT_PI)
        y0 = gamma * ia
        # pads: Sia/k2 = 0 kill padded-line contributions; the rest are
        # benign finite values (the 1e30 position sentinel masks them)
        A = ia * ia
        y2 = y0 * y0
        far_rows = [
            row(A, 1.0),                        # c0: ia^2
            row(0.5 + y2, 1.5),                 # c1
            row(4.0 * y2 * A, 4.0),             # c2
            row(S * gamma * A * (1.0 / np.pi), 0.0),  # k2
        ]
        if rows_per_state == 4:
            # slim far-only pack (farall/stencil voigt): the w4 tile never
            # runs, so (Sia, ia, y0) would be dead VMEM and transpose work
            packed = far_rows
        else:
            packed = [row(Sia, 0.0), row(ia, 1.0), row(y0, 1.0)]
            if rows_per_state == 7:
                packed += far_rows
    else:
        packed = [row(S, 0.0), row(alpha, 1.0), row(gamma, 1.0)]
    rows_l = [nul_full, nul_lo_full]
    for st in range(n_states):
        rows_l += [p[st : st + 1] for p in packed]
    Pk = jnp.concatenate(rows_l, axis=0)  # [n_params, n_lines_pad]
    n_params = Pk.shape[0]
    if pret:
        # pre-transpose in XLA: [n_lines_pad, n_params], lines on
        # sublanes — group slices are plain 8-aligned sublane reads
        Pk = Pk.T
    return Pk, n_params


def _grouped_call(kern, nu_blocks, nu_blocks_lo, Pk, scal, dnear_op, T2,
                  n_states, B, n_blocks, pret, n_params, interpret):
    """SEG-segmented pallas_call driver for the grouped kernel.

    SMEM rows cost ~512 B each regardless of width (1 MB budget), so the
    per-block scalar arrays cap a single call at ~SEG blocks; larger grids
    run as several segment calls over the same resident catalog.
    """
    SEG = 512
    outs = []
    for a in range(0, n_blocks, SEG):
        b = min(a + SEG, n_blocks)
        seg = b - a
        out = pl.pallas_call(
            kern,
            grid=(seg,),
            in_specs=[
                pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Pk/PkT, resident
                pl.BlockSpec(memory_space=pltpu.SMEM),  # packed per-block scalars
                pl.BlockSpec(memory_space=pltpu.SMEM),  # d_near
                pl.BlockSpec(memory_space=pltpu.SMEM),  # T
            ],
            out_specs=pl.BlockSpec(
                (n_states, 1, 1, B), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_states, seg, 1, B), jnp.float32),
            scratch_shapes=(
                [] if pret else [pltpu.VMEM((CHUNK, n_params), jnp.float32)]
            ),
            interpret=interpret,
        )(
            nu_blocks[a:b], nu_blocks_lo[a:b], Pk,
            scal[a:b], dnear_op, T2,
        )
        outs.append(out.reshape(n_states, seg * B))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _grouped_lane_cost(shape: str, strategy: str, n_states: int) -> int:
    """Per-line VMEM cost (in f32 lanes) of the grouped kernel's pack.

    Mirrors the layout choice in ``_pallas_sigma_impl``: the split Voigt pack
    is lane-major ([n_params, n_lines_pad]), everything else is
    pre-transposed and charges its parameter count lane-padded to a 128
    multiple.
    """
    use_split = shape in _SPLIT_SHAPES and strategy != "nosplit"
    voigt_split = use_split and shape in ("voigt", "voigt_ref")
    rows = 3
    if voigt_split:
        rows = 4 if strategy == "stencil" else 7  # slim far-only pack
    n_params = rows * n_states + 2
    return n_params if voigt_split else -(-n_params // 128) * 128


def _resident_bytes_est(n_lines: int, slab: int, lane_cost: int) -> int:
    slab_pad = -(-max(1, slab) // CHUNK) * CHUNK
    n_lines_pad = -(-(n_lines + slab_pad + CHUNK) // 128) * 128
    return n_lines_pad * lane_cost * 4


def _segment_cap(shape: str, strategy: str, n_states: int, limit: int,
                 slab: int) -> int:
    """Largest CHUNK-multiple segment length whose WORST-CASE resident pack
    fits in ``limit`` (per-segment slab can reach min(global slab, segment
    length) — both bounds are exact upper bounds on any clipped count)."""
    lane_cost = _grouped_lane_cost(shape, strategy, n_states)
    L = (limit // (4 * lane_cost) // CHUNK) * CHUNK
    while L >= CHUNK:
        if _resident_bytes_est(L, min(slab, L), lane_cost) <= limit:
            return L
        L -= CHUNK
    return 0


def _slice_lines_seg(lines, a: int, b: int):
    import dataclasses

    return dataclasses.replace(
        lines, **{f: getattr(lines, f)[a:b] for f in _PER_LINE_FIELDS}
    )


def _pallas_sigma_segmented(shape, interpret, plan, lines, T, P, Pp, conc,
                            strategy, lgroup, L_seg, limit=None):
    """Catalog-segmented grouped evaluation for plans too large to reside.

    The line axis is cut into ``L_seg``-length segments; each segment is a
    contiguous sub-catalog small enough for the fast VMEM-resident grouped
    kernel, evaluated over only the contiguous block range whose windows
    intersect it (plans are monotone: sorted lines x sorted blocks), and the
    overlapping per-segment outputs are summed. This replaces the
    XLA-gathered fallback for large static-plan catalogs — full-HITRAN-scale
    line lists run at near-resident speed instead of paying ~75% of wall
    clock in slab gathers. Exactness: each (block, line) window pair lands in
    exactly one segment; the in-kernel |dnu| masks (cut, near/far) partition
    identically to the single-call kernel, with d_near computed from each
    segment's own max(alpha) (any d_near >= 15*alpha keeps Humlicek region 1
    valid for the far sweep, see ``_profile_far``).
    """
    start = np.asarray(plan.start, np.int64)
    end = start + np.asarray(plan.count, np.int64)
    n_lines = lines.nu.shape[0]
    B = plan.block
    nb64 = np.asarray(plan.nu_blocks, np.float64)
    nb_hi = nb64.astype(np.float32)
    nb_lo = (nb64 - nb_hi.astype(np.float64)).astype(np.float32)

    out = None
    for a in range(0, n_lines, L_seg):
        b = min(n_lines, a + L_seg)
        s_c = np.clip(start, a, b)
        c_s = (np.clip(end, a, b) - s_c).astype(np.int32)
        nz = np.nonzero(c_s > 0)[0]
        if nz.size == 0:
            continue
        blo, bhi = int(nz[0]), int(nz[-1]) + 1
        n_nu_seg = min((bhi - blo) * B, plan.n_nu - blo * B)
        sig = _pallas_sigma_impl(
            shape, interpret, float(plan.cut), B, bhi - blo,
            int(c_s[blo:bhi].max()), n_nu_seg,
            jnp.asarray(nb_hi[blo:bhi]), jnp.asarray(nb_lo[blo:bhi]),
            jnp.asarray((s_c - a)[blo:bhi].astype(np.int32)),
            jnp.asarray(c_s[blo:bhi]),
            _slice_lines_seg(lines, a, b), T, P, Pp,
            None if conc is None else conc[..., a:b],
            strategy=strategy, lgroup=lgroup, limit=limit,
        )
        if out is None:
            out = jnp.zeros((sig.shape[0], plan.n_nu), jnp.float32)
        out = out.at[:, blo * B : blo * B + n_nu_seg].add(sig)
    if out is None:  # no block window contains any line
        n_states = jnp.atleast_1d(jnp.asarray(T)).shape[0]
        out = jnp.zeros((n_states, plan.n_nu), jnp.float32)
    return out


# coarse-far split constants: h = d_far/Q_COARSE coarse spacing, outer roll
# width W_ROLL_CELLS*h. Calibrated on the CO2 fixture (scripts/
# proto_coarse_far.py, f64): max rel sigma error 4.5e-5 (sigma >= 1e-3 peak),
# 2.2e-4 (>= 1e-4 peak), 2.1e-2 (>= 1e-8 peak, deep micro-windows);
# transmittance-level max |dTr| 1.5e-3 at tau_peak = 1e4, band-integrated
# flux error <= 6e-7 of unity transmittance even at tau_peak = 1e8.
Q_COARSE = 16
W_ROLL_CELLS = 4


def _coarse_far_params(plan: LineWindowPlan, frac_limit: float = 0.6) -> tuple | None:
    """Static (grid-only) applicability/sizing of the coarse-far split.

    Runs at trace time inside the jitted wrapper, where line positions are
    tracers — so sizing uses the plan's grid geometry only: with mean grid
    spacing dbar and block span bs, the fine fraction of dense work is
    ~(4*d_far + bs)/(2*cut + bs) and the coarse fraction ~Q*dbar/d_far
    (coarse point count over fine point count). The optimum
    d_far is taken analytically and clamped to the three-zone constraints.
    Returns (d_far, h, n_cc, c_ratio) or None when the split cannot win.

    Q (coarse points per d_far) adapts to the grid (round 5): the
    calibration Q = 16 is tried first (sqrt-space cubic interpolation error
    ~1.5e-5 class relative to the far field); moderately-dense grids — the
    production full-spectrum configs at ~0.05 cm^-1 spacing — reject Q = 16
    on the work-fraction bound but accept Q = 8, whose interpolation error
    is ~2^4 coarser (~2e-4 class relative to the far field, still an order
    below the far field's share of peak sigma). Band-level accuracy is
    gated in tests/test_linesum_pallas.py for both classes.
    """
    nu = np.asarray(plan.nu, np.float64)
    if plan.n_nu < 2048:
        return None
    cut = float(plan.cut)
    diffs = np.diff(nu)
    dbar = float((nu[-1] - nu[0]) / max(plan.n_nu - 1, 1))
    dmax = float(diffs.max())
    bs = plan.block * dbar
    # Lattice deviation for the uniformity decision: the strided
    # interpolation path assumes nu[i] = nu[0] + i*dbar, so what must be
    # bounded is each point's CUMULATIVE deviation from that ideal lattice
    # (a per-interval jitter bound would admit chirped/multi-segment grids
    # whose drift accumulates to many coarse cells — round-5 review
    # finding, reproduced at 1.8e-2 sigma error). f32-quantized uniform
    # grids (x64-off pipelines) deviate by at most one f32 ulp of the
    # largest wavenumber — a tiny fraction of any admissible coarse cell —
    # and still pass; genuinely non-uniform grids take the exact
    # host-precomputed gather stencil instead. The bound is checked
    # against each candidate h below: deviation eps shifts the
    # interpolation sample by eps/h, perturbing a d_far-smooth far field
    # by ~eps/d_far relative — <= 0.05*h keeps that far below the split's
    # documented accuracy class.
    lattice_dev = float(
        np.abs(nu - (nu[0] + np.arange(nu.shape[0]) * dbar)).max()
    )
    for Q in (Q_COARSE, 8):
        # minimize fine + coarse work fractions over d_far:
        # d/dd [4d/(2cut+bs) + Q*dbar/d] = 0
        d_far = float(np.sqrt(Q * dbar * (2.0 * cut + bs) / 4.0))
        h = d_far / Q
        # uniform fine grids snap h to an exact multiple of the spacing, so
        # the stencil interpolation is strided slices instead of device
        # gathers (TPU minor-dim gathers would dominate the saved time)
        c_ratio = 0
        if lattice_dev <= 0.05 * h:
            c_ratio = int(h / dbar)
            if c_ratio < 2:
                continue
            h = c_ratio * dbar
        w_roll = W_ROLL_CELLS * h
        if cut <= 2.0 * d_far + w_roll:       # three zones must be disjoint
            continue
        if h < 2.0 * dmax:                    # coarsening below 2x cannot pay
            continue
        fine_frac = (4.0 * d_far + bs) / (2.0 * cut + bs)
        coarse_frac = dbar / h
        ann_frac = 2.0 * w_roll / (2.0 * cut + bs)
        # frac_limit: 0.6 for an explicit strategy="coarse" request (the
        # split still beats the GROUPED kernel there); the voigt
        # auto-routing passes 0.2 — measured on hardware, the split only
        # beats the STENCIL incumbent on line-resolving grids (round-3
        # dense 2^18: sum ~0.07, 5x win; the 0.05 cm^-1 production
        # full-spectrum class: sum ~0.49, 2.3x LOSS through the production
        # dispatcher — scripts/probe_stencil_overhead.py round-5 notes)
        if fine_frac + coarse_frac + ann_frac > frac_limit:
            continue
        n_cc = int(np.ceil((nu[-1] - nu[0] + 8.0 * h) / h)) + 6
        return d_far, h, n_cc, c_ratio
    return None


def _pallas_sigma_coarse(shape, interpret, plan, lines, T, P, Pp, conc,
                         lgroup, params, limit):
    """Coarse-grid far-field line sum (Ewald-style smooth splitting).

    Each line's truncated profile is split by a C^2 switch W(dnu^2) ramping
    over [d_far, 2*d_far] and an outer roll Wout over [cut-w_roll, cut]:

      sigma = [near w4 + mid (1-W) r1 + annulus (1-Wout) r1]  (fine grid)
            + Interp[ W * Wout * r1 summed on the coarse grid ](nu_fine)

    The bracketed fine part needs per-point evaluation only within 2*d_far
    (plus the thin annulus that keeps the reference's HARD truncation at
    ``cut`` exact); the far part is smooth by construction, evaluated on a
    uniform grid with spacing h = d_far/16 and cubic-interpolated in
    sqrt(sigma) space (compresses the far field's dynamic range; clamped
    non-negative). Both passes run `_kernel_resident_grouped` over the SAME
    resident parameter pack. Dense profile work drops to ~15-30% of the
    one-pass kernel on dense grids (the structural inversion of the
    reference's every-point-every-line sweep, ref line_shapes.jl:53-87).
    Accuracy: see the calibration constants above (Q_COARSE).
    """
    d_far, h, n_cc, c_ratio = params
    n_lines = int(lines.nu.shape[0])
    n_states = jnp.atleast_1d(jnp.asarray(T)).shape[0]
    if not _coarse_resident_ok(shape, n_states, n_lines, limit):
        return None   # catalog too large to reside; caller falls back

    # grids are static here (the plan is a static arg): build the re-blocked
    # fine grid and the coarse grid host-side; line positions stay traced
    nu_f = np.asarray(plan.nu, np.float64)
    B = plan.block
    Bf = _fine_block(shape, plan.n_nu, B)
    n_blocks_f = -(-plan.n_nu // Bf)
    pad_f = np.full(n_blocks_f * Bf - plan.n_nu, nu_f[-1])
    fnb64 = np.concatenate([nu_f, pad_f]).reshape(n_blocks_f, Bf)
    nu_c0 = nu_f[0] - 2.0 * h
    n_blocks_c = -(-n_cc // B)
    pad_c = np.full(n_blocks_c * B - n_cc, nu_c0 + (n_cc - 1) * h)
    cnb64 = np.concatenate([nu_c0 + np.arange(n_cc) * h, pad_c]).reshape(
        n_blocks_c, B
    )

    def blocks_f32(nb64):
        nb_hi = nb64.astype(np.float32)
        nb_lo = (nb64 - nb_hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(nb_hi)[:, None, :], jnp.asarray(nb_lo)[:, None, :]

    interp_static = None
    if c_ratio < 2:  # non-uniform grid: host-precomputed gather stencil
        u = (nu_f - nu_c0) / h
        j = np.clip(np.floor(u).astype(np.int64), 1, n_cc - 3)
        interp_static = (j, _cr_weights((u - j).astype(np.float64)))
    # stencil-near fine pass where the geometry accepts (coarse spacing vs
    # alpha, see _build_stencil_geom — dense line-resolving grids reject)
    stencil_geom = _stencil_geom_cached(plan, lines)
    return _coarse_core(
        shape, interpret, lgroup, float(plan.cut), plan.n_nu,
        (d_far, h, n_cc, c_ratio), lines, T, P, Pp, conc,
        *blocks_f32(fnb64), *blocks_f32(cnb64), interp_static,
        stencil_geom=stencil_geom,
    )


def _fine_block(shape, n_nu, B):
    """Fine-pass block width: the fine windows are tiny (~4*d_far), so
    per-block fixed cost (output write, sweep prologues, pipeline bubbles)
    dominates at B=128 — measured 2.5 us/block regardless of states; wider
    lanes amortize it for a ~(Bf-B)*spacing window widening the small cut
    keeps cheap. phco2's chi(dnu, T) factor adds per-state [LG, Bf]
    temporaries on top of the accumulators and wider lanes spill registers
    (measured: 128 -> 7.3 ms, 256 -> 10.1, 512 -> 14.4 on the bench phco2
    config); the lean voigt far tile tolerates — and wants — 512
    (7.9 -> 6.0 ms on dense 2^18)."""
    if n_nu >= 2048 and shape in ("voigt", "voigt_ref"):
        return 512
    return B


def _coarse_resident_ok(shape, n_states, n_lines, limit):
    """Both passes share one resident pack; in-kernel dynamic slices overrun
    the catalog by at most one alignment chunk per sweep."""
    n_lines_pad = -(-(n_lines + 2 * CHUNK) // 128) * 128
    lane_cost = _grouped_lane_cost(shape, "grouped", n_states)
    return n_lines_pad * lane_cost * 4 <= limit


def _cr_weights(t):
    """Catmull-Rom cubic weights at fractional offsets t (numpy, host)."""
    return np.stack(
        [
            -0.5 * t**3 + t**2 - 0.5 * t,
            1.5 * t**3 - 2.5 * t**2 + 1.0,
            -1.5 * t**3 + 2.0 * t**2 + 0.5 * t,
            0.5 * t**3 - 0.5 * t**2,
        ]
    ).astype(np.float32)


def _coarse_core(shape, interpret, lgroup, cut, n_nu, meta, lines, T, P, Pp,
                 conc, fnb, fnb_lo, cnb, cnb_lo, interp_static=None,
                 stencil_geom=None):
    """Shared traced core of the coarse-far split.

    ``fnb``/``cnb`` (+_lo): [n_blocks, 1, B]-shaped two-float block grids —
    jnp constants from the static wrapper or traced pytree leaves from the
    sharded device wrapper. Every line-index window is a traced searchsorted
    against the (traced) line positions; block-edge margins of 0.01 cm^-1
    swallow f32 edge rounding, with membership decided exactly in-kernel by
    the two-float |dnu| masks. ``interp_static``: (j, wk) host gather stencil
    for non-uniform grids (None = strided-slice path, requires
    c_ratio >= 2).
    """
    d_far, h, n_cc, c_ratio = meta
    w_roll = W_ROLL_CELLS * h
    D1, D2 = d_far * d_far, 4.0 * d_far * d_far
    R1, R2 = (cut - w_roll) ** 2, cut * cut
    Bf = fnb.shape[-1]
    B = cnb.shape[-1]
    n_blocks_f = fnb.shape[0]
    n_blocks_c = cnb.shape[0]

    T = jnp.atleast_1d(jnp.asarray(T, jnp.float32))
    n_states = T.shape[0]
    n_lines = int(lines.nu.shape[0])
    voigt_split = shape in ("voigt", "voigt_ref")
    rows_per_state = 7 if voigt_split else 3
    # layout matches the one-pass kernel's per-shape choice; an
    # all-pre-transposed variant (hypothesis: skip sweep_chunked's per-sweep
    # scratch relayout in the four tiny fine sweeps) measured WORSE on the
    # dense 2^18 voigt A/B (6.0 -> 6.5 ms), so the chunked-transpose pack
    # stays for split voigt
    pret = not voigt_split
    n_lines_pad = -(-(n_lines + 2 * CHUNK) // 128) * 128

    P = jnp.atleast_1d(jnp.asarray(P, jnp.float32))
    Pp = jnp.atleast_1d(jnp.asarray(Pp, jnp.float32))
    S, alpha, gamma = _line_params(lines, T, P, Pp, conc=conc)
    S = S.astype(jnp.float32)
    alpha = alpha.astype(jnp.float32)
    gamma = gamma.astype(jnp.float32)
    nu_l = jnp.asarray(lines.nu).astype(jnp.float32)
    if jnp.asarray(lines.nu).dtype == jnp.float32:
        nu_l_lo = jnp.asarray(lines.nu_lo, jnp.float32)
    else:
        nu_l_lo = (jnp.asarray(lines.nu) - nu_l.astype(jnp.float64)).astype(jnp.float32)

    Pk, n_params = _grouped_pack(
        shape, S, alpha, gamma, nu_l, nu_l_lo, n_lines_pad, rows_per_state,
        pret,
    )
    T2 = T[:, None]

    def win(nb, lo_off, hi_off):
        s = jnp.searchsorted(nu_l, nb[:, 0, 0] + lo_off).astype(jnp.int32)
        e = jnp.searchsorted(
            nu_l, nb[:, 0, -1] + hi_off, side="right"
        ).astype(jnp.int32)
        return s, jnp.maximum(e - s, 0)

    # --- fine pass: near w4 + mid (1-W) + exact outer annuli ---------------
    amax = jnp.max(jnp.where(nu_l < 1e29, alpha, 0.0))
    if shape.endswith("_ref"):
        amax = amax * (1.0 / _SQRT_LN2)
    d_near = jnp.minimum(15.0 * amax, 2.0 * d_far).astype(jnp.float32)
    startF, cntF = win(fnb, -2.0 * d_far - 0.01, 2.0 * d_far + 0.01)
    wend = startF + cntF
    s2 = jnp.searchsorted(nu_l, fnb[:, 0, 0] - d_near - 0.01).astype(jnp.int32)
    e2 = jnp.searchsorted(
        nu_l, fnb[:, 0, -1] + d_near + 0.01, side="right"
    ).astype(jnp.int32)
    start2 = jnp.clip(s2, startF, wend)
    cnt2 = jnp.clip(e2, start2, wend) - start2
    # annulus slabs: lines whose [cut-w_roll, cut] shell reaches the block
    sL, cL = win(fnb, -cut - 0.01, -cut + w_roll + 0.01)
    sR, cR = win(fnb, cut - w_roll - 0.01, cut + 0.01)
    if stencil_geom is not None:
        start2 = jnp.zeros_like(startF)
        cnt2 = jnp.zeros_like(cntF)
    scalF = jnp.stack(
        [startF, cntF, start2, cnt2, sL, cL, sR, cR], axis=1
    )
    dnear_op = d_near.reshape(1, 1)
    fmode = "fine_stencil" if stencil_geom is not None else "fine"
    kernF = partial(
        _kernel_resident_grouped, shape, cut, n_states, n_params,
        True, lgroup, pret, (fmode, D1, D2, R1, R2, 2.0 * d_far),
    )
    fine = _grouped_call(
        kernF, fnb, fnb_lo, Pk, scalF, dnear_op, T2,
        n_states, Bf, n_blocks_f, pret, n_params, interpret,
    )[:, :n_nu]
    if stencil_geom is not None:
        smeta, sarr = stencil_geom
        fine = fine + _stencil_apply(
            shape, smeta, {k: jnp.asarray(v) for k, v in sarr.items()},
            S, alpha, gamma, T, cut, n_nu, weight=(D1, D2),
        )

    # --- coarse pass: W * Wout weighted region-1 far field -----------------
    startC, cntC = win(cnb, -cut - 0.01, cut + 0.01)
    scalC = jnp.stack(
        [startC, cntC, jnp.zeros_like(startC), jnp.zeros_like(startC)], axis=1
    )
    kernC = partial(
        _kernel_resident_grouped, shape, cut, n_states, n_params,
        True, lgroup, pret, ("coarse", D1, D2, R1, R2, d_far),
    )
    far_c = _grouped_call(
        kernC, cnb, cnb_lo, Pk, scalC, dnear_op, T2,
        n_states, B, n_blocks_c, pret, n_params, interpret,
    )[:, :n_cc]

    # --- cubic interpolation in sqrt space -----------------------------------
    G = jnp.sqrt(jnp.maximum(far_c, 0.0))
    if interp_static is None:
        # uniform fine grid with h = c_ratio * spacing and nu_c0 on-grid:
        # fine index i = m*c + r has j = m + 2 and t = r/c, so the stencil is
        # four STRIDED SLICES of the coarse field + one [4, c] weight table —
        # no device gathers (TPU minor-dim gathers would eat the saved time)
        c = c_ratio
        n_m = -(-n_nu // c)
        wk_r = _cr_weights(np.arange(c, dtype=np.float64) / c)   # [4, c]
        acc = jnp.zeros((n_states, n_m, c), jnp.float32)
        for k in range(4):
            Gk = jax.lax.slice_in_dim(G, 1 + k, 1 + k + n_m, axis=1)
            acc = acc + Gk[:, :, None] * jnp.asarray(wk_r[k])[None, None, :]
        far = acc.reshape(n_states, n_m * c)[:, :n_nu]
    else:
        j, wk = interp_static
        far = jnp.zeros((n_states, n_nu), jnp.float32)
        for k in range(4):
            far = far + jnp.asarray(wk[k]) * jnp.take(
                G, jnp.asarray(j + (k - 1), jnp.int32), axis=1
            )
    far = jnp.square(jnp.maximum(far, 0.0))
    return fine + far


def _stencil_width(plan: LineWindowPlan, lines) -> int:
    """Static stencil width K for the stencil-near strategy.

    2K consecutive grid points (a row-aligned window of two K-point rows)
    around each line must cover the line's |x| <= 15 core (the region-1
    validity hole, see `_profile_far`) — the row alignment guarantees K/2
    points of reach on each side, so K/2 grid steps must reach
    15*alpha_eff at the WORST local grid spacing. The Doppler width bound
    is evaluated at T = 1000 K — the TIPS fit domain ceiling (ref
    molparam, scripts/molparam.py:29), beyond which the physics is out of
    domain anyway — and includes the *_ref convention's 1/sqrt(ln2)
    rescale. When ``lines`` is traced (called inside an outer jit, e.g.
    an RCM step), a mass-2 (H2, the lightest HITRAN radiator)
    catalog-wide fallback bound is used instead.
    """
    grid = np.asarray(plan.nu, np.float64)
    if grid.shape[0] < 2:
        return 8
    dmin = float(np.diff(grid).min())
    from ..constants import C_LIGHT, R_GAS

    nu_l = getattr(lines, "nu", None)
    mu = getattr(lines, "mu", None)
    if isinstance(nu_l, jax.core.Tracer) or isinstance(mu, jax.core.Tracer):
        amax = (float(grid[-1]) + plan.cut) / C_LIGHT * float(
            np.sqrt(2.0 * R_GAS * 1000.0 / 0.002)
        )
    else:
        nu_c = np.asarray(nu_l, np.float64)
        mu_c = np.asarray(mu, np.float64)
        # only lines within reach of the grid matter (lines beyond the cut
        # never contribute; their clamped stencil windows mask to zero)
        m = (nu_c >= grid[0] - plan.cut) & (nu_c <= grid[-1] + plan.cut)
        amax = float(
            (nu_c[m] / C_LIGHT * np.sqrt(2.0 * R_GAS * 1000.0 / mu_c[m])).max()
        ) if m.any() else 0.0
    amax = amax * (1.0 / _SQRT_LN2)  # covers the *_ref convention too
    k = 2 * (int(np.ceil(15.0 * amax / dmin)) + 2)
    k = -(-k // 8) * 8
    return max(8, min(k, int(plan.n_nu)))


# chunk height (output rows of width K per placement matmul tile) and the
# entry pad of the small chunk class; see _build_stencil_geom
_STENCIL_CROWS = 64
_STENCIL_MSMALL = 64


def _build_stencil_geom(plan: LineWindowPlan, lines):
    """Host-side static geometry for the stencil-near strategy.

    Returns ``(meta, arrays)`` or ``None`` when the strategy does not
    apply (traced line data, degenerate grids, or a near zone too wide
    for a cheap stencil — e.g. line-resolving dense grids, where the
    coarse-far split is the right tool instead).

    Geometry: each line owns a row-aligned window of 2K grid points
    (rows q and q+1 of the K-wide row grid), guaranteeing K/2 points of
    reach each side of the line. The placement back onto the spectrum is
    a chunk-diagonal one-hot matmul (MXU): output rows are grouped into
    chunks of _STENCIL_CROWS rows; each chunk's contributing window
    entries are a contiguous (line-sorted) slice of the payload, placed
    by a static 0/1 matrix — XLA scatter on TPU costs ~10 us per 1k
    index rows, ~50x this matmul formulation at bench geometry. Chunks
    come in two pad classes (most spectral chunks hold few lines; band
    heads hold hundreds) to keep the one-hot tensors small.

    meta (hashable statics):
      (K, R, CH, n_lines, classes) with classes = per-class tuples
      (chunk_ids, entry_starts, Mpad).
    arrays (numpy, passed traced through the jit boundary):
      dnu_hi/dnu_lo [2K, L] two-float point-minus-line offsets, and one
      0/1 placement tensor [nc, CROWS, Mpad] per class.
    """
    nu_l = getattr(lines, "nu", None)
    mu = getattr(lines, "mu", None)
    if isinstance(nu_l, jax.core.Tracer) or isinstance(mu, jax.core.Tracer):
        return None
    nu_l64 = np.asarray(nu_l, np.float64)
    # two-float positions: when the catalog stores f32 nu + lo residuals
    # (x64 disabled), the true f64 position is their sum — dropping the lo
    # part shifts line cores by up to ~1e-4 cm^-1 (the exact trap the
    # sharded-plan f32-grid bug hit in round 2, see CLAUDE.md)
    if np.asarray(nu_l).dtype == np.float32 and getattr(lines, "nu_lo", None) is not None:
        nu_lo = getattr(lines, "nu_lo")
        if isinstance(nu_lo, jax.core.Tracer):
            return None
        nu_l64 = nu_l64 + np.asarray(nu_lo, np.float64)
    L = int(nu_l64.shape[0])
    grid = np.asarray(plan.nu, np.float64)
    n_nu = int(plan.n_nu)
    if L == 0 or grid.shape[0] < 2:
        return None
    K = _stencil_width(plan, lines)
    from ..constants import C_LIGHT, R_GAS

    mu_c = np.asarray(mu, np.float64)
    mrange = (nu_l64 >= grid[0] - plan.cut) & (nu_l64 <= grid[-1] + plan.cut)
    if not mrange.any():
        return None
    amax = float(
        (nu_l64[mrange] / C_LIGHT
         * np.sqrt(2.0 * R_GAS * 1000.0 / mu_c[mrange])).max()
    ) / _SQRT_LN2
    # reject: near zone reaching the cut would couple the correction mask
    # to the far sweep's cut mask (see _stencil_apply exactness note), and
    # K > 64 marks a line-resolving grid where the O(L*K) pass stops being
    # cheap (the coarse-far split owns that regime)
    if K > 64 or n_nu < 4 * K or 15.0 * amax >= 0.99 * plan.cut:
        return None
    R = -(-n_nu // K)
    if R < 2:
        return None
    idx0 = np.searchsorted(grid, nu_l64).astype(np.int64)
    q = np.clip((idx0 - K // 2) // K, 0, R - 2).astype(np.int64)
    gwin = q[:, None] * K + np.arange(2 * K, dtype=np.int64)[None, :]
    gval = grid[np.minimum(gwin, n_nu - 1)]
    dnu64 = gval - nu_l64[:, None]  # [L, 2K]
    dnu_hi = dnu64.astype(np.float32)
    dnu_lo = (dnu64 - dnu_hi.astype(np.float64)).astype(np.float32)

    CROWS = _STENCIL_CROWS
    CH = -(-R // CROWS)
    cS = np.arange(CH, dtype=np.int64) * CROWS
    cE = cS + CROWS
    # lines touch chunk c iff q in [cS-1, cE) (row q or q+1 in range)
    uLo = np.searchsorted(q, cS - 1, side="left")
    uHi = np.searchsorted(q, cE, side="left")
    uHi = np.maximum(uHi, uLo)
    m2 = 2 * (uHi - uLo)  # entries per chunk (A and B row per line)
    # adaptive pad classes: most spectral chunks hold few lines while band
    # heads hold hundreds — one global pad would multiply the payload
    # copies ~10x (pads are per-class chunk copies, see _stencil_apply)
    Mlarge = int(-(-max(int(m2.max()), 2) // 64) * 64)
    bounds = [b for b in (_STENCIL_MSMALL, 256, 1024) if b < Mlarge]
    bounds.append(Mlarge)
    classes_np = []
    lo_b = -1
    for Mpad in bounds:
        which = (m2 > lo_b) & (m2 <= Mpad)
        lo_b = Mpad
        ids = np.nonzero(which)[0]
        if ids.size == 0:
            continue
        nc = ids.size
        OH = np.zeros((nc, CROWS, Mpad), np.float32)
        for ci, c in enumerate(ids):
            for j, l in enumerate(range(uLo[c], uHi[c])):
                rA = q[l] - cS[c]
                if 0 <= rA < CROWS:
                    OH[ci, rA, 2 * j] = 1.0
                rB = rA + 1
                if 0 <= rB < CROWS:
                    OH[ci, rB, 2 * j + 1] = 1.0
        classes_np.append(
            (tuple(int(i) for i in ids),
             tuple(int(2 * u) for u in uLo[ids]),
             int(Mpad), OH)
        )
    meta = (int(K), int(R), int(CH), L,
            tuple((ids, starts, Mpad) for ids, starts, Mpad, _ in classes_np))
    arrays = {"dnu_hi": dnu_hi.T.copy(), "dnu_lo": dnu_lo.T.copy()}
    for i, (_, _, _, OH) in enumerate(classes_np):
        arrays[f"oh{i}"] = OH
    return meta, arrays


def _stencil_geom_cached(plan: LineWindowPlan, lines):
    """Build-once cache of the stencil geometry on the (frozen) plan.

    Keyed by the catalog size and end positions — a plan is built for one
    catalog (DirectGas.from_lines pairs them 1:1), so this only guards
    against accidental reuse with a different lines object. Returns None
    when ``lines`` is traced and no concrete build has happened yet.
    """
    nu_l = getattr(lines, "nu", None)
    cache = getattr(plan, "_stencil_cache", None)
    if isinstance(nu_l, jax.core.Tracer):
        if cache is not None and cache[0][0] == int(nu_l.shape[0]):
            return cache[1]
        return None
    nu_np = np.asarray(nu_l, np.float64)
    key = (int(nu_np.shape[0]),
           float(nu_np[0]) if nu_np.size else 0.0,
           float(nu_np[-1]) if nu_np.size else 0.0)
    if cache is not None and cache[0] == key:
        return cache[1]
    geom = _build_stencil_geom(plan, lines)
    object.__setattr__(plan, "_stencil_cache", (key, geom))
    return geom


def _stencil_apply(shape, meta, arrays, S, alpha, gamma, T, cut, n_nu,
                   weight=None):
    """XLA-side near-core correction for the stencil-near strategy.

    The grouped kernel's `farall` mode accumulates the slim Humlicek
    region-1 profile over the WHOLE window (`tile_far`); region 1 is only
    invalid inside |x| <= 15 (s = |x|+y >= 15 fails there unless y is
    large, where w4 == region 1 anyway). That core spans a handful of
    grid points per line, so the exact fix is added here:
    Sia*(w4 - region1) on each line's 2K-point window — O(L*K) work in a
    lanes-major [st, 2K, L] layout replacing the old near sweep's
    O(near_rows * B) dense w4 kernel evals (~63% of the split-kernel wall
    on the CO2 bench geometry) — then placed by the static one-hot
    matmuls described in `_build_stencil_geom`.

    Exactness: the correction is masked to x^2 <= 225 (and |dnu| <= cut);
    because it *corrects* rather than partitions, a rounding disagreement
    at the mask boundary costs at most the region-1 error there (~1e-4
    rel), not a double count. The region-1 value subtracted here is the
    same algebra as `tile_far` (f32 rounding differences are ~1e-7 of a
    term that is itself << w4 at the core). The 0/1 placement matmul is
    exact in f32 (bf16x3 decomposition is exact for multipliers 0 and 1).
    """
    K, R, CH, L, classes = meta
    n_states = S.shape[0]
    a_eff = alpha * (1.0 / _SQRT_LN2) if shape.endswith("_ref") else alpha
    ia = 1.0 / a_eff
    Sia = S * ia * (1.0 / _SQRT_PI)
    y0 = gamma * ia
    dnu_hi = jnp.asarray(arrays["dnu_hi"])  # [2K, L]
    dnu_lo = jnp.asarray(arrays["dnu_lo"])
    # compute layout [2K, st, L]: every broadcast is a free leading-axis
    # expansion and the line axis stays on lanes — the naive [st, 2K, L]
    # payload shuffle cost ~1.8 ms in thin-lane relayouts, 5x this whole
    # correction pass
    x = (ia[None] * dnu_hi[:, None, :] + ia[None] * dnu_lo[:, None, :])
    if shape.startswith("phco2"):
        dnu = dnu_hi + dnu_lo
        y = y0[None] * chi_phco2(dnu[:, None, :], T[None, :, None])
    else:
        y = jnp.broadcast_to(y0[None], x.shape)
    w4 = wofz_re(x, y)
    # Humlicek region-1 real part, same algebra as tile_far's phco2 branch
    t2r = y * y - x * x
    t2i = -2.0 * x * y
    br = 0.5 + t2r
    d2 = br * br + t2i * t2i
    wr1 = 0.5641896 * (y * br - x * t2i) / d2
    corr = Sia[None] * (w4 - wr1)
    if weight is not None:
        # coarse-far fine pass: the near correction carries the same
        # 1 - W(dnu^2) switch weight as the kernel's mid sweep, so lines
        # whose |x| <= 15 core reaches into the switch ramp (or past it,
        # where the coarse field holds the full far term) stay exact
        D1, D2 = weight
        dD = dnu_hi + dnu_lo
        corr = corr * (1.0 - _smoothstep_d2(dD * dD, D1, D2))[:, None, :]
    mask = (x * x <= 225.0) & (jnp.abs(dnu_hi) <= cut)[:, None, :]
    corr = jnp.where(mask, corr, 0.0)  # [2K, st, L]
    # payload rows e = 2l + part: part 0 -> output row q_l (window cols
    # [0, K)), part 1 -> row q_l + 1 (cols [K, 2K)). ONE clean 2D
    # transpose gives [L, (k2, st)]; k2 = part*K + k is the leading block
    # of that axis, so the [2L, K*st] entry view is a free reshape. The
    # (k, st) column order is opaque to the placement matmul.
    pay = corr.reshape(2 * K * n_states, L).T.reshape(2 * L, K * n_states)
    max_pad = max(Mpad for _, _, Mpad in classes) if classes else 0
    pay = jnp.concatenate(
        [pay, jnp.zeros((max_pad, K * n_states), jnp.float32)], axis=0
    )
    rows = jnp.zeros((CH, _STENCIL_CROWS, K * n_states), jnp.float32)
    for i, (ids, starts, Mpad) in enumerate(classes):
        OH = jnp.asarray(arrays[f"oh{i}"])  # [nc, CROWS, Mpad]
        chunks = jnp.stack([
            jax.lax.slice(pay, (s, 0), (s + Mpad, K * n_states))
            for s in starts
        ])  # [nc, Mpad, K*st]
        # the default TPU matmul truncates f32 operands to bf16 (~1e-3 rel —
        # measured 5.6e-2 sigma error at line cores); HIGH (bf16x3) is
        # enough here: with exact-0/1 multipliers the only residual is the
        # payload's double-bf16-split remainder, ~2^-18 rel of the placed
        # correction (HIGHEST costs 7x for the last ~1.5 digits)
        oc = jnp.einsum("cim,cmk->cik", OH, chunks,
                        precision=jax.lax.Precision.HIGH)
        rows = rows.at[jnp.asarray(ids, jnp.int32)].set(oc)
    # [CH, CROWS, K, st] -> [points, st] is a free reshape; one final 2D
    # transpose puts states back on rows
    out = rows.reshape(CH * _STENCIL_CROWS * K, n_states).T
    return out[:, :n_nu]


def _pallas_sigma_impl(shape, interpret, cut, B, n_blocks, slab, n_nu,
                       nu_blocks_hi, nu_blocks_lo, start, count,
                       lines, T, P, Pp, conc, strategy="auto", lgroup=8,
                       limit=None, stencil_meta=None, stencil_arrays=None):
    """Shared traced implementation behind both plan representations.

    ``cut/B/n_blocks/slab/n_nu`` are python statics; the per-block arrays
    (``nu_blocks_hi/lo`` [n_blocks, B] f32, ``start``/``count`` [n_blocks]
    i32) may be constants (static-plan wrapper) or traced values (sharded
    device-plan wrapper).
    """
    T = jnp.atleast_1d(jnp.asarray(T, jnp.float32))
    P = jnp.atleast_1d(jnp.asarray(P, jnp.float32))
    Pp = jnp.atleast_1d(jnp.asarray(Pp, jnp.float32))
    n_states = T.shape[0]
    limit = _RESIDENT_VMEM_LIMIT if limit is None else int(limit)
    S, alpha, gamma = _line_params(lines, T, P, Pp, conc=conc)  # [n_states, n_lines]
    S = S.astype(jnp.float32)
    alpha = alpha.astype(jnp.float32)
    gamma = gamma.astype(jnp.float32)
    # two-float line positions: hi (f32) + residual lo (f32) reconstruct dnu
    # to ~1e-7 cm^-1 inside the f32 kernel
    nu_l = jnp.asarray(lines.nu).astype(jnp.float32)
    if jnp.asarray(lines.nu).dtype == jnp.float32:
        nu_l_lo = jnp.asarray(lines.nu_lo, jnp.float32)
    else:
        nu_l_lo = (jnp.asarray(lines.nu) - nu_l.astype(jnp.float64)).astype(jnp.float32)
    n_lines = nu_l.shape[0]

    slab_pad = -(-slab // CHUNK) * CHUNK
    nu_blocks = nu_blocks_hi[:, None, :]
    nu_blocks_lo = nu_blocks_lo[:, None, :]
    counts = count.astype(jnp.int32)[:, None]  # SMEM scalars are 2-D
    start = start.astype(jnp.int32)
    T2 = T[:, None]

    n_lines_pad = -(-(n_lines + slab_pad + CHUNK) // 128) * 128
    use_split = shape in _SPLIT_SHAPES and strategy != "nosplit"
    voigt_split = use_split and shape in ("voigt", "voigt_ref")
    stencil = (strategy == "stencil" and shape in _SPLIT_SHAPES
               and stencil_meta is not None)
    # farall/stencil voigt: slim far-only pack (the w4 tile never runs)
    rows_per_state = (4 if stencil else 7) if voigt_split else 3
    # layout per shape (see _kernel_resident_grouped): split voigt keeps the
    # lane-major chunked-transpose pack; everything else pre-transposes in
    # XLA ([n_lines_pad, n_params], charging lane padding to a 128 multiple)
    pret = not voigt_split
    n_params_grouped = rows_per_state * n_states + 2
    if pret:
        resident_bytes = n_lines_pad * (-(-n_params_grouped // 128) * 128) * 4
    else:
        resident_bytes = n_lines_pad * n_params_grouped * 4
    # the sublane-grouped kernel is the default resident strategy: measured
    # 4.95x the lane-major kernel on the CO2 bench config — per-block work is
    # ceil(cnt/8)*8 lines instead of ceil(cnt/128)*128, and sparse spectral
    # regions dominate real catalogs. strategy='lane' keeps the lane-major
    # variant for A/B comparisons.
    if (
        strategy in ("auto", "grouped", "nosplit", "stencil")
        and resident_bytes <= limit
    ):
        Pk, n_params = _grouped_pack(
            shape, S, alpha, gamma, nu_l, nu_l_lo, n_lines_pad,
            rows_per_state, pret,
        )

        # near/far Humlicek split (see _kernel_resident_grouped/_profile_far):
        # d_near = 15*max(alpha) bounds the region where the full w4 is
        # needed; the near sub-slab [start2, start2+cnt2) per block comes
        # from a traced searchsorted against the block edges (conservative
        # 0.01 cm^-1 margin swallows f32 position rounding — membership is
        # decided exactly in-kernel by the |dnu| <=/> d_near masks).
        if use_split and not stencil:
            # exclude padding lines (nu sentinel 1e30 — the sharded path's
            # slabs arrive pre-padded): their Doppler width alpha ~ nu/c is
            # astronomically large and would clamp d_near to cut, silently
            # degenerating the far sweep to empty and the near sweep to the
            # full window (all-w4, ~2x dense work)
            amax = jnp.max(jnp.where(nu_l < 1e29, alpha, 0.0))
            if shape.endswith("_ref"):
                amax = amax * (1.0 / _SQRT_LN2)
            d_near = jnp.minimum(15.0 * amax, cut).astype(jnp.float32)
            wend = start + count.astype(jnp.int32)
            s2 = jnp.searchsorted(
                nu_l, nu_blocks_hi[:, 0] - d_near - 0.01
            ).astype(jnp.int32)
            e2 = jnp.searchsorted(
                nu_l, nu_blocks_hi[:, -1] + d_near + 0.01, side="right"
            ).astype(jnp.int32)
            start2 = jnp.clip(s2, start, wend)
            cnt2 = jnp.clip(e2, start2, wend) - start2
            dnear_op = d_near.reshape(1, 1)
        else:
            start2 = jnp.zeros_like(start)
            cnt2 = jnp.zeros((n_blocks,), jnp.int32)
            dnear_op = jnp.zeros((1, 1), jnp.float32)
        scal = jnp.stack(
            [start, count.astype(jnp.int32), start2, cnt2], axis=1
        )  # [n_blocks, 4] packed per-block SMEM scalars

        if lgroup % 8 != 0 or CHUNK % lgroup != 0:
            raise ValueError(f"lgroup must divide {CHUNK} and be a multiple of 8, got {lgroup}")
        kern = partial(
            _kernel_resident_grouped, shape, float(cut), n_states, n_params,
            use_split, lgroup, pret, ("farall",) if stencil else None,
        )
        full = _grouped_call(
            kern, nu_blocks, nu_blocks_lo, Pk, scal, dnear_op, T2,
            n_states, B, n_blocks, pret, n_params, interpret,
        )
        out = full[:, :n_nu]
        if stencil:
            out = out + _stencil_apply(
                shape, stencil_meta, stencil_arrays, S, alpha, gamma,
                T, float(cut), n_nu,
            )
        return out

    if (
        strategy == "lane"
        and (3 * n_states + 2) * n_lines_pad * 4 <= limit
    ):
        # pad with far-away line positions (window mask kills them) and zero
        # strengths so out-of-range dynamic slices read inert data
        pad_n = n_lines_pad - n_lines
        nul_full = jnp.concatenate([nu_l, jnp.full((pad_n,), 1e30, jnp.float32)])[None, :]
        nul_lo_full = jnp.concatenate([nu_l_lo, jnp.zeros((pad_n,), jnp.float32)])[None, :]
        zpad = jnp.zeros((n_states, pad_n), jnp.float32)
        opad = jnp.ones((n_states, pad_n), jnp.float32)
        S_full = jnp.concatenate([S, zpad], axis=1)
        a_full = jnp.concatenate([alpha, opad], axis=1)
        g_full = jnp.concatenate([gamma, opad], axis=1)
        # align starts down to CHUNK so in-kernel lane slices are provably
        # 128-aligned; the freed lead-in lines are outside every point's
        # window (start was the searchsorted lower bound), so the cut mask
        # zeroes them — counts grow by the alignment slack. Zero-count blocks
        # must stay zero: the slack alone would otherwise make them walk a
        # full inert chunk (~14% of all dense work on the CO2 bench grid).
        start_al = (start // CHUNK) * CHUNK
        cnt_al = jnp.where(count == 0, 0, start - start_al + count)
        kern = partial(_kernel_resident, shape, float(cut), n_states)

        # SMEM rows cost ~512 B each regardless of width (1 MB budget), so the
        # per-block scalar arrays cap a single call at ~SEG blocks; larger
        # grids run as several segment calls over the same resident catalog.
        SEG = 512
        outs = []
        for a in range(0, n_blocks, SEG):
            b = min(a + SEG, n_blocks)
            seg = b - a
            out = pl.pallas_call(
                kern,
                grid=(seg,),
                in_specs=[
                    pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # nul_full, resident
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # nul_lo_full
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # S_full
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # a_full
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # g_full
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # T
                ],
                out_specs=pl.BlockSpec(
                    (n_states, 1, 1, B), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((n_states, seg, 1, B), jnp.float32),
                interpret=interpret,
            )(
                nu_blocks[a:b], nu_blocks_lo[a:b],
                nul_full, nul_lo_full, S_full, a_full, g_full,
                start_al[a:b][:, None],
                cnt_al[a:b][:, None],
                T2,
            )
            outs.append(out.reshape(n_states, seg * B))
        full = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        return full[:, :n_nu]

    # fallback: XLA-gathered slabs (large catalogs)
    offs = jnp.arange(slab_pad, dtype=jnp.int32)
    idx_j = jnp.clip(start[:, None] + offs[None, :], 0, max(n_lines - 1, 0))

    # singleton axes keep the TPU (sublane, lane) tiling rule satisfied: every
    # VMEM block's trailing two dims are (1, full-lane-width)
    nul_g = nu_l[idx_j][:, None, :]                      # [n_blocks, 1, slab_pad]
    nul_lo_g = nu_l_lo[idx_j][:, None, :]
    S_g = S[:, idx_j][:, :, None, :]                     # [n_states, n_blocks, 1, slab_pad]
    a_g = alpha[:, idx_j][:, :, None, :]
    g_g = gamma[:, idx_j][:, :, None, :]

    kern = partial(_kernel, shape, slab_pad, float(cut), n_states)
    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, slab_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, slab_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_states, 1, 1, slab_pad), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_states, 1, 1, slab_pad), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_states, 1, 1, slab_pad), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_states, 1, 1, B), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_states, n_blocks, 1, B), jnp.float32),
        interpret=interpret,
    )(nu_blocks, nu_blocks_lo, nul_g, nul_lo_g, S_g, a_g, g_g, counts, T2)
    return out.reshape(n_states, n_blocks * B)[:, :n_nu]


@partial(
    jax.jit,
    static_argnames=("plan", "shape", "interpret", "strategy", "lgroup",
                     "resident_limit", "stencil_meta", "coarse_frac_limit"),
)
def _sigma_from_lines_pallas_jit(
    plan: LineWindowPlan,
    lines,
    T,
    P,
    Pp,
    shape: str = "voigt",
    interpret: bool = False,
    conc=None,
    strategy: str = "auto",
    lgroup: int = 8,
    resident_limit: int | None = None,
    stencil_meta=None,
    stencil_arrays=None,
    coarse_frac_limit: float = 0.6,
):
    limit = _RESIDENT_VMEM_LIMIT if resident_limit is None else int(resident_limit)
    if strategy == "auto" and shape.startswith("phco2"):
        # phco2 auto-routes through the coarse-far split where the geometry
        # accepts: the sub-Lorentzian chi factor suppresses the far field
        # where the split operates, so the accuracy cost is negligible
        # (measured vs the f64 oracle at the cut=500 bench geometry:
        # 1.9e-6 rel at sigma >= 1e-4 peak, 1.3e-3 at >= 1e-8 peak, vs the
        # default kernel's 7e-7) for a 2.1x wall-time win (BASELINE.md).
        strategy = "coarse"
    if strategy == "coarse":
        # coarse-grid far field (Ewald-style smooth split) — wins on dense
        # grids where most in-window pairs sit far from their line; falls
        # back to the standard grouped kernel when the geometry or VMEM
        # budget says no (see _coarse_far_params / _pallas_sigma_coarse)
        if shape in _SPLIT_SHAPES:
            params = _coarse_far_params(plan, frac_limit=coarse_frac_limit)
            if params is not None:
                out = _pallas_sigma_coarse(
                    shape, interpret, plan, lines, T, P, Pp, conc, lgroup,
                    params, limit,
                )
                if out is not None:
                    return out
        strategy = "auto"
    if strategy == "stencil" and (
        shape not in _SPLIT_SHAPES or stencil_meta is None
    ):
        strategy = "auto"
    if strategy in ("auto", "grouped", "nosplit", "stencil"):
        n_states = jnp.atleast_1d(jnp.asarray(T)).shape[0]
        n_lines = lines.nu.shape[0]
        lane_cost = _grouped_lane_cost(shape, strategy, n_states)
        if _resident_bytes_est(n_lines, plan.slab, lane_cost) > limit:
            if strategy == "stencil":
                # the segmented path keeps the in-kernel near/far split
                strategy = "auto"
            L_seg = _segment_cap(shape, strategy, n_states, limit, plan.slab)
            if L_seg >= CHUNK and n_lines > L_seg:
                return _pallas_sigma_segmented(
                    shape, interpret, plan, lines, T, P, Pp, conc,
                    strategy, lgroup, L_seg, limit=limit,
                )
    nb64 = np.asarray(plan.nu_blocks, np.float64)
    nb_hi = nb64.astype(np.float32)
    return _pallas_sigma_impl(
        shape, interpret, float(plan.cut), plan.block, plan.n_blocks,
        plan.slab, plan.n_nu,
        jnp.asarray(nb_hi),
        jnp.asarray((nb64 - nb_hi.astype(np.float64)).astype(np.float32)),
        jnp.asarray(plan.start, jnp.int32), jnp.asarray(plan.count, jnp.int32),
        lines, T, P, Pp, conc, strategy=strategy, lgroup=lgroup, limit=limit,
        stencil_meta=stencil_meta, stencil_arrays=stencil_arrays,
    )


def sigma_from_lines_pallas(
    plan: LineWindowPlan,
    lines,
    T,
    P,
    Pp,
    shape: str = "voigt",
    interpret: bool = False,
    conc=None,
    strategy: str = "auto",
    lgroup: int = 8,
    resident_limit: int | None = None,
):
    """Absorption cross-sections sigma[n_states, n_nu] via the Pallas TPU kernel.

    Drop-in for :func:`clearsky_tpu.ops.linesum.sigma_from_lines` restricted to
    1-D state batches (T, P, Pp of shape [n_states]). Set ``interpret=True``
    to run the kernel in interpreter mode off-TPU (used by the CPU test suite).

    Execution strategies, chosen by catalog size: small catalogs stay fully
    VMEM-resident (sublane-grouped kernel); catalogs too large to reside are
    SEGMENTED along the line axis and each resident-sized segment runs the
    same grouped kernel over its intersecting block range (overlapping
    outputs summed) — full-HITRAN-scale line lists keep near-resident
    throughput. ``strategy="gathered"`` forces the XLA-gathered per-block
    slab fallback (A/B baseline); ``strategy="stencil"`` replaces the
    in-kernel near sweep with an XLA stencil correction (see
    `_stencil_near_correction`); ``resident_limit`` overrides the VMEM
    budget (testing).

    This thin wrapper resolves the stencil geometry *before* the jit
    boundary, so a top-level call with concrete line data builds (and
    caches on the plan) the static window/placement tables
    (`_build_stencil_geom`); inside an outer jit the cached geometry is
    reused, or the strategy falls back to the in-kernel split when no
    concrete build has happened.
    """
    stencil_meta = stencil_arrays = None
    coarse_frac_limit = 0.6
    if shape in _SPLIT_SHAPES:
        # opportunistic warm while line data is concrete: the jit body
        # (incl. the coarse fine pass) sees traced catalogs and can only
        # use a geometry already cached on the plan
        _stencil_geom_cached(plan, lines)
    if (strategy == "coarse" and shape in ("voigt", "voigt_ref")
            and _coarse_far_params(plan) is None):
        # statically-rejected coarse geometry: fall back through the same
        # auto-routing a plain "auto" call gets (stencil where it accepts)
        strategy = "auto"
    if strategy == "auto" and shape in ("voigt", "voigt_ref"):
        # auto-routing (round 5 order): the coarse-far split first — where
        # the grid geometry accepts it (dense grids, incl. the adaptive
        # Q = 8 class of the ~0.05 cm^-1 production full-spectrum configs)
        # it deletes the far-field work entirely (measured 1.1e11 evals/s
        # vs the stencil strategy's 2.2e10 on the dense 2^18 band grid) at
        # a band-gated accuracy cost (tests/test_linesum_pallas.py). The
        # stencil-near strategy is next: it replaces the in-kernel near
        # sweep (~63% of the split kernel's wall on the CO2 bench; 1.87x at
        # 131072 pts, 3.1x at 16384) whenever the static geometry accepts
        # and the catalog is VMEM-resident (the segmented path keeps the
        # in-kernel split). phco2 stays on its coarse-far auto route
        # (decided inside the jit body).
        n_states_est = int(np.prod(np.shape(T))) or 1
        n_lines = int(lines.nu.shape[0])
        limit = _RESIDENT_VMEM_LIMIT if resident_limit is None else int(resident_limit)
        if (_coarse_far_params(plan, frac_limit=0.2) is not None
                and _coarse_resident_ok(shape, n_states_est, n_lines, limit)):
            strategy = "coarse"
            coarse_frac_limit = 0.2
        else:
            lane_cost = _grouped_lane_cost(shape, "stencil", n_states_est)
            if _resident_bytes_est(n_lines, plan.slab, lane_cost) <= limit:
                geom = _stencil_geom_cached(plan, lines)
                if geom is not None:
                    strategy = "stencil"
    if strategy == "stencil" and shape in _SPLIT_SHAPES:
        geom = _stencil_geom_cached(plan, lines)
        if geom is not None:
            stencil_meta, arrays_np = geom
            stencil_arrays = {k: jnp.asarray(v) for k, v in arrays_np.items()}
    return _sigma_from_lines_pallas_jit(
        plan, lines, T, P, Pp, shape=shape, interpret=interpret, conc=conc,
        strategy=strategy, lgroup=lgroup, resident_limit=resident_limit,
        stencil_meta=stencil_meta, stencil_arrays=stencil_arrays,
        coarse_frac_limit=coarse_frac_limit,
    )


@partial(jax.jit, static_argnames=("shape", "interpret", "strategy", "lgroup"))
def sigma_from_lines_pallas_device(
    dplan: DeviceWindowPlan,
    lines,
    T,
    P,
    Pp,
    shape: str = "voigt",
    interpret: bool = False,
    conc=None,
    strategy: str = "auto",
    lgroup: int = 8,
):
    """Pallas line sum over a device-array plan (the sharded path).

    ``dplan``'s per-block arrays are ordinary pytree leaves, so this entry
    point works with the plan and line slab sharded over a mesh and traced
    inside ``shard_map`` — each spectral shard runs the kernel against its own
    contiguous line slab (SURVEY.md §5 halo design).

    When the plan carries prebuilt coarse-far grids (``coarse_meta`` set by
    ``absorption.sharded.shard_line_gas`` where the static geometry accepts),
    ``strategy="coarse"`` — and "auto" for phco2, mirroring the static path —
    runs the split through the shared traced core.
    """
    if (
        dplan.coarse_meta is not None
        and shape in _SPLIT_SHAPES
        and (
            strategy == "coarse"
            or (strategy == "auto" and shape.startswith("phco2"))
            # voigt "auto" mirrors the static wrapper's round-5 policy:
            # only where the stricter work-fraction bound accepted
            # (shard_line_gas sets coarse_auto from frac_limit=0.2)
            or (strategy == "auto" and dplan.coarse_auto)
        )
    ):
        n_states = jnp.atleast_1d(jnp.asarray(T)).shape[0]
        if _coarse_resident_ok(
            shape, n_states, lines.nu.shape[0], _RESIDENT_VMEM_LIMIT
        ):
            return _coarse_core(
                shape, interpret, lgroup, dplan.cut, dplan.n_nu,
                dplan.coarse_meta, lines, T, P, Pp, conc,
                dplan.fine_blocks.astype(jnp.float32)[:, None, :],
                dplan.fine_blocks_lo[:, None, :],
                dplan.coarse_blocks.astype(jnp.float32)[:, None, :],
                dplan.coarse_blocks_lo[:, None, :],
            )
    if strategy == "coarse":
        strategy = "auto"
    nb = dplan.nu_blocks
    if nb.dtype == jnp.float64:
        nb_hi = nb.astype(jnp.float32)
        nb_lo = (nb - nb_hi.astype(jnp.float64)).astype(jnp.float32)
    else:
        nb_hi = nb.astype(jnp.float32)
        nb_lo = dplan.nu_blocks_lo
    return _pallas_sigma_impl(
        shape, interpret, dplan.cut, dplan.block, dplan.n_blocks,
        dplan.slab, dplan.n_nu,
        nb_hi, nb_lo, dplan.start, dplan.count,
        lines, T, P, Pp, conc, strategy=strategy, lgroup=lgroup,
    )


# ---------------------------------------------------------------------------
# Differentiability: the Pallas kernel with a custom JVP whose tangent routes
# through the jnp oracle (ops.linesum.sigma_from_lines), so jax.jacfwd works
# through DirectGas/MultiGas on TPU — the equivalent of the reference's
# any-absorber jacobian (ref radiative_convective.jl:153-171).
# ---------------------------------------------------------------------------


@partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2))
def _pallas_jvp_core(plan, shape, strategy, lines, T, P, Pp, conc):
    return sigma_from_lines_pallas(
        plan, lines, T, P, Pp, shape, conc=conc, strategy=strategy
    )


@_pallas_jvp_core.defjvp
def _pallas_jvp_rule(plan, shape, strategy, primals, tangents):
    out = _pallas_jvp_core(plan, shape, strategy, *primals)
    _, dout = jax.jvp(
        lambda lines, T, P, Pp, conc: sigma_from_lines(
            plan, lines, T, P, Pp, shape, conc=conc
        ),
        primals,
        tangents,
    )
    return out, dout


def sigma_from_lines_pallas_jvp(plan, lines, T, P, Pp, shape="voigt",
                                conc=None, strategy="auto"):
    """Pallas kernel primal + oracle-path JVP (differentiable TPU line sum)."""
    return _pallas_jvp_core(plan, shape, strategy, lines, T, P, Pp, conc)


@partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _pallas_device_jvp_core(shape, strategy, dplan, lines, T, P, Pp, conc):
    return sigma_from_lines_pallas_device(
        dplan, lines, T, P, Pp, shape, conc=conc, strategy=strategy
    )


@_pallas_device_jvp_core.defjvp
def _pallas_device_jvp_rule(shape, strategy, primals, tangents):
    out = _pallas_device_jvp_core(shape, strategy, *primals)
    _, dout = jax.jvp(
        lambda dplan, lines, T, P, Pp, conc: sigma_from_lines_device(
            dplan, lines, T, P, Pp, shape, conc=conc
        ),
        primals,
        tangents,
    )
    return out, dout


def sigma_from_lines_pallas_device_jvp(
    dplan, lines, T, P, Pp, shape="voigt", conc=None, strategy="auto"
):
    """Device-plan (sharded) kernel primal + oracle-path JVP.

    The sharded counterpart of :func:`sigma_from_lines_pallas_jvp` — without
    it, ``jacfwd`` through a ``shard_lbl``-converted gas on TPU would reach
    ``pallas_call`` with a JVP tracer and fail (Pallas kernels carry no
    autodiff rule). The plan is an ordinary pytree argument here (it may be
    traced/sharded), with the usual zero tangents.
    """
    return _pallas_device_jvp_core(shape, strategy, dplan, lines, T, P, Pp, conc)
