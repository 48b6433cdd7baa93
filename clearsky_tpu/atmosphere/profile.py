"""Atmospheric profiles: quantities interpolated in log-pressure.

Equivalent of the reference's ``AtmosphericProfile`` (ClearSky.jl
``atmospherics.jl:4-26``): linear interpolation of any quantity against ln P,
with linear extrapolation outside the grid (``NoBoundaries`` semantics).
jit/vmap-safe; stateless (pure arrays), so the reference's defensive
``copyprofile`` race-avoidance machinery (ref shared.jl:25-29) is unnecessary.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.interp import interp_linear

__all__ = ["AtmosphericProfile", "formprofile", "formprofiles"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, eq=False)
class AtmosphericProfile:
    """Callable y(P) via linear interpolation in ln P. Ref atmospherics.jl:4-26."""

    lnP: jax.Array
    y: jax.Array

    @classmethod
    def create(cls, P, y) -> "AtmosphericProfile":
        P = jnp.asarray(P)
        y = jnp.asarray(y)
        if P.shape != y.shape:
            raise ValueError("cannot form AtmosphericProfile with unequal numbers of points")
        idx = jnp.argsort(P)
        return cls(lnP=jnp.log(P[idx]), y=y[idx])

    def __call__(self, P):
        return interp_linear(jnp.log(jnp.asarray(P)), self.lnP, self.y)


def formprofile(P, x):
    """Normalize profile input: vector -> interpolated profile, scalar ->
    constant, callable -> itself. Ref fluxes.jl:13-17.

    The returned callable accepts any of the framework's closure signatures
    — ``fT(P)``, ``fmu(T, P)``, ``fcp(T, P)`` — by interpolating against the
    LAST positional argument, which is the pressure in every convention.
    (The reference's equivalent wrapper shares this flaw-turned-contract:
    its interpolators are pressure-only, so a vector input can never encode
    genuine temperature dependence — pass a callable for that.)
    """
    if callable(x):
        return x
    x = jnp.asarray(x)
    if x.ndim == 0:
        return lambda *args: x
    prof = AtmosphericProfile.create(P, x)
    return lambda *args: prof(args[-1])


def formprofiles(P, *xs):
    return tuple(formprofile(P, x) for x in xs)
