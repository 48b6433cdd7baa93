"""Hydrostatic pressure-altitude relations.

Equivalent of ClearSky.jl ``atmospherics.jl:31-175``: scale height, hydrostatic
integration of dlnP/dz = -mu g/(R T), altitude inversion, and the
``Hydrostatic`` profile type. Setup-time integrations run host-side on a fixed
dense grid (RK4, replacing the reference's adaptive Radau); evaluation is a
jit-safe interpolation.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import R_GAS, P_MIN
from ..utils.grids import logrange
from ..utils.ode import rk4_dense, rk4_to
from ..utils.rootfind import regula_falsi
from ..utils.interp import interp_linear

__all__ = ["scale_height", "hydrostatic", "altitude", "Hydrostatic"]


def scale_height(g, mu, T):
    """Atmospheric scale height R T/(mu g) [m]. Ref atmospherics.jl:48."""
    return R_GAS * T / (mu * g)


def _dlnPdz(z, lnP, p):
    """dlnP/dz = -mu g/(R T) with the reference's pressure guards.

    Ref atmospherics.jl:51-62.
    """
    Ps, g, fT, fmu = p
    P = np.exp(lnP)
    if P < P_MIN:
        return 0.0
    P = min(P, Ps)
    T = float(fT(P))
    mu = float(fmu(T, P))
    return -mu * g / (R_GAS * T)


def hydrostatic(z, Ps, g, fT, fmu, n: int = 512):
    """Hydrostatic pressure [Pa] at altitude z [m]. Ref atmospherics.jl:81-88."""
    if z < 0:
        raise ValueError(f"cannot compute pressure at negative altitude {z} m")
    if not Ps > P_MIN:
        raise ValueError(f"pressure cannot be less than {P_MIN} Pa")
    if z == 0:
        return float(Ps)
    return float(np.exp(rk4_to(_dlnPdz, np.log(Ps), 0.0, z, (Ps, g, fT, fmu), n=n)))


def altitude(P, Ps, g, fT, fmu):
    """Altitude [m] where hydrostatic pressure equals P. Ref atmospherics.jl:103-119."""
    if not P < Ps:
        raise ValueError("surface pressure must be greater than pressure aloft")
    z1, z2 = 0.0, 1e2
    P2 = hydrostatic(z2, Ps, g, fT, fmu)
    while P2 > P:
        z1, z2 = z2, z2 * 2
        P2 = hydrostatic(z2, Ps, g, fT, fmu)
    return regula_falsi(
        lambda z, _: np.log(hydrostatic(z, Ps, g, fT, fmu)) - np.log(P), z1, z2
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, eq=False)
class Hydrostatic:
    """Pre-integrated hydrostatic profile, callable z -> P [Pa].

    Ref atmospherics.jl:146-166: pressure vs altitude integrated once on a
    stretched grid, then interpolated (flat-clamped at the ends, matching the
    reference's WeakBoundaries).
    """

    z: jax.Array
    lnP: jax.Array
    zt: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @classmethod
    def create(cls, Ps, Pt, g, fT, fmu, N: int = 100) -> "Hydrostatic":
        zt = altitude(Pt, Ps, g, fT, fmu)
        z = logrange(0.0, zt, N)
        lnP = rk4_dense(_dlnPdz, np.log(Ps), z, (Ps, g, fT, fmu))
        return cls(z=jnp.asarray(z), lnP=jnp.asarray(lnP), zt=float(zt))

    def __call__(self, z):
        return jnp.exp(interp_linear(jnp.asarray(z), self.z, self.lnP, extrapolate=False))

    def altitude(self, P):
        """Invert the profile: altitude where pressure equals P. Ref atmospherics.jl:173-175."""
        lnP = np.asarray(self.lnP)
        z = np.asarray(self.z)
        return float(np.interp(-np.log(P), -lnP, z))
