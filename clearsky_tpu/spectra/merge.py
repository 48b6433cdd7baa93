"""Merging line catalogs across molecules for fused evaluation.

A multi-gas atmosphere evaluates one line-sum kernel per gas; since the
kernel's work is banded in wavenumber, merging the (sorted) catalogs of all
molecules into one produces a single kernel pass over the union — one launch,
shared dnu tiles and window masks wherever molecules' bands overlap.

Intensity scaling is linear in the reference intensity, so a fixed molar
concentration folds directly into S; the self/air broadening split needs the
per-line partial pressure, so the merged catalog carries a per-line
concentration array (see ``MultiGas``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .lines import SpectralLines

__all__ = ["merge_catalogs", "merge_lines"]


def merge_catalogs(lines_list) -> tuple[SpectralLines, jnp.ndarray]:
    """Merge several molecules' catalogs into one sorted catalog.

    Returns (merged_lines, mol_ptr[n_lines]) with every per-line array
    concatenated and re-sorted by wavenumber; TIPS coefficient tables are
    stacked with ``iso_ptr`` re-offset, and ``mol_ptr`` records which input
    catalog each merged line came from (for per-molecule concentration
    gathers — the fused equivalent of ref gases.jl:278's fC(T,P)).
    """
    if len(lines_list) == 0:
        raise ValueError("nothing to merge")
    # pad TIPS tables to a common polynomial order, then stack
    ncheb = max(np.asarray(l.tips_coeffs).shape[1] for l in lines_list)
    tips_rows = []
    ptr_off = 0
    nus, nu_los, Ss, gas_, gss, Epps, nas, mus, As, isos, ptrs, mols = (
        [] for _ in range(12)
    )
    for m, l in enumerate(lines_list):
        t = np.asarray(l.tips_coeffs)
        if t.shape[1] < ncheb:
            t = np.pad(t, ((0, 0), (0, ncheb - t.shape[1])))
        tips_rows.append(t)
        nus.append(np.asarray(l.nu, np.float64))
        nu_los.append(np.asarray(l.nu_lo))
        Ss.append(np.asarray(l.S))
        gas_.append(np.asarray(l.ga))
        gss.append(np.asarray(l.gs))
        Epps.append(np.asarray(l.Epp))
        nas.append(np.asarray(l.na))
        mus.append(np.asarray(l.mu))
        As.append(np.asarray(l.A))
        isos.append(np.asarray(l.iso))
        ptrs.append(np.asarray(l.iso_ptr) + ptr_off)
        mols.append(np.full(l.n_lines, m, dtype=np.int32))
        ptr_off += t.shape[0]

    nu = np.concatenate(nus)
    order = np.argsort(nu, kind="stable")
    f = jnp.asarray
    merged = SpectralLines(
        nu=f(nu[order]),
        nu_lo=f(np.concatenate(nu_los)[order]),
        S=f(np.concatenate(Ss)[order]),
        ga=f(np.concatenate(gas_)[order]),
        gs=f(np.concatenate(gss)[order]),
        Epp=f(np.concatenate(Epps)[order]),
        na=f(np.concatenate(nas)[order]),
        mu=f(np.concatenate(mus)[order]),
        A=f(np.concatenate(As)[order]),
        iso=f(np.concatenate(isos)[order]),
        iso_ptr=f(np.concatenate(ptrs)[order]),
        tips_coeffs=f(np.concatenate(tips_rows, axis=0)),
        name="+".join(l.name for l in lines_list),
        formula="+".join(l.formula for l in lines_list),
        M=0,
    )
    return merged, f(np.concatenate(mols)[order])


def merge_lines(entries) -> tuple[SpectralLines, jnp.ndarray]:
    """Merge [(SpectralLines, concentration), ...] with FIXED scalar
    concentrations folded per line.

    Returns (merged_lines, conc[n_lines]). For temperature/pressure-dependent
    concentrations use :func:`merge_catalogs` + per-molecule fC gathers
    (``MultiGas`` does this automatically when given callables).
    """
    lines_list = [e[0] for e in entries]
    concs = [float(e[1]) for e in entries]
    for c in concs:
        if not (0.0 <= c <= 1.0):
            raise ValueError(f"gas molar concentration must be in [0,1], not {c}")
    merged, mol_ptr = merge_catalogs(lines_list)
    return merged, jnp.asarray(np.asarray(concs)[np.asarray(mol_ptr)])
