"""SpectralLines: a molecule's line catalog as a device-resident pytree.

Struct-of-arrays equivalent of the reference's ``SpectralLines``
(ClearSky.jl ``src/hitran/par.jl:224-286``): per-line wavenumbers, intensities,
broadening parameters, lower-state energies, isotopologue molar masses and
abundances resolved from the molparam table — all sorted ascending in
wavenumber. Adds the packed TIPS Chebyshev coefficient matrix (one row per
isotopologue present, gathered per line with ``iso_ptr``) so the intensity
temperature scaling runs densely on device.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .molparam import molparam, ISOINDEX
from .par import read_par

__all__ = ["SpectralLines", "PER_LINE_FIELDS"]

# every leaf with leading dimension n_lines (tips_coeffs is a shared table);
# the single source of truth for code that slices/pads/stacks catalogs along
# the line axis (sharded slabs, catalog segmentation) — extend this when
# adding a per-line field
PER_LINE_FIELDS = (
    "nu", "nu_lo", "S", "ga", "gs", "Epp", "na", "mu", "A", "iso", "iso_ptr"
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralLines:
    """One molecule's spectral lines (ref par.jl:224-286), as dense arrays.

    Data fields (leaves) have leading dimension n_lines unless noted:
      nu, S, ga, gs, Epp, na — HITRAN line parameters (see ``read_par``),
      nu_lo — float32 residual of the float64 line positions (nu64 - f32(nu64)),
        letting float32 device kernels reconstruct dnu to ~1e-7 cm^-1 via
        two-float arithmetic (f32 alone rounds positions by ~1e-4 cm^-1,
        a percent-level profile error at line cores),
      mu — isotopologue molar mass [kg/mole], A — isotopologue abundance,
      iso — local isotopologue index, iso_ptr — row into ``tips_coeffs``,
      tips_coeffs — [n_iso_present, ncheb_max] Q(T)/Qref Chebyshev fits.
    """

    nu: jax.Array
    nu_lo: jax.Array
    S: jax.Array
    ga: jax.Array
    gs: jax.Array
    Epp: jax.Array
    na: jax.Array
    mu: jax.Array
    A: jax.Array
    iso: jax.Array
    iso_ptr: jax.Array
    tips_coeffs: jax.Array
    name: str = dataclasses.field(metadata=dict(static=True), default="")
    formula: str = dataclasses.field(metadata=dict(static=True), default="")
    M: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def n_lines(self) -> int:
        return self.nu.shape[0]

    @property
    def mean_molar_mass(self) -> float:
        """Abundance-weighted mean molar mass [kg/mole]. Ref gases.jl:233."""
        return float(np.sum(np.asarray(self.A) * np.asarray(self.mu)) / np.sum(np.asarray(self.A)))

    @classmethod
    def from_par_dict(cls, par: dict) -> "SpectralLines":
        """Build from a ``read_par`` dict. Ref par.jl:253-284."""
        Ms = np.unique(par["M"])
        if len(Ms) != 1:
            raise ValueError("SpectralLines must contain only one molecule's lines")
        M = int(Ms[0])
        mp = molparam(M)
        iso = np.array([ISOINDEX[c] for c in par["I"]], dtype=np.int32)
        if iso.max(initial=0) > mp.n_iso:
            raise ValueError(
                f"isotopologue index {iso.max()} outside molparam table for {mp.formula}"
            )
        A = mp.A[iso - 1]
        mu = mp.mu[iso - 1]
        # pack TIPS fits for the isotopologues actually present; fail loudly if
        # any present isotopologue lacks a fit (the reference throws lazily at
        # evaluation time, ref line_shapes.jl:118 — we validate up front).
        present = np.unique(iso)
        missing = [int(i) for i in present if not mp.hascheb[i - 1]]
        if missing:
            raise ValueError(
                f"no TIPS Chebyshev fit for isotopologue(s) {missing} of "
                f"{mp.name} ({mp.formula})"
            )
        ptr_of_iso = {int(i): k for k, i in enumerate(present)}
        iso_ptr = np.array([ptr_of_iso[int(i)] for i in iso], dtype=np.int32)
        tips = mp.cheb[present - 1]
        # trim trailing all-zero columns for compactness
        ncheb_used = int(mp.ncheb[present - 1].max())
        tips = tips[:, :ncheb_used]

        idx = np.argsort(par["nu"], kind="stable")
        f = jnp.asarray
        nu64 = np.asarray(par["nu"][idx], dtype=np.float64)
        nu_hi32 = nu64.astype(np.float32)
        return cls(
            nu=f(nu64),
            nu_lo=f((nu64 - nu_hi32.astype(np.float64)).astype(np.float32)),
            S=f(par["S"][idx]),
            ga=f(par["ga"][idx]),
            gs=f(par["gs"][idx]),
            Epp=f(par["Epp"][idx]),
            na=f(par["na"][idx]),
            mu=f(mu[idx]),
            A=f(A[idx]),
            iso=f(iso[idx]),
            iso_ptr=f(iso_ptr[idx]),
            tips_coeffs=f(tips),
            name=mp.name,
            formula=mp.formula,
            M=M,
        )

    @classmethod
    def from_par(cls, filename: str, **kwargs) -> "SpectralLines":
        """Read a .par file directly. Ref par.jl:286.

        Uses the numeric-only parse (C++ fast path when built) — the line
        physics never reads the quantum-state string columns.
        """
        kwargs.setdefault("strings", False)
        return cls.from_par_dict(read_par(filename, **kwargs))

    def __repr__(self):  # pragma: no cover - cosmetic
        try:
            lo = float(self.nu[0])
            hi = float(self.nu[-1])
        except Exception:
            lo = hi = float("nan")
        return (
            f"SpectralLines({self.name} [{self.formula}], M={self.M}, "
            f"n_lines={self.nu.shape[0]}, nu in [{lo:.6g}, {hi:.6g}] cm^-1)"
        )
