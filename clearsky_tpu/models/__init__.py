"""Time-stepping column models (the reference's L7, ref radiative_convective.jl)."""

from .rcm import (
    RCM,
    heating,
    radiate_state,
    step,
    step_n,
    run,
    jacobian,
    update_absorber,
    convective_adjustment,
    radiative_grid,
)

__all__ = [
    "RCM",
    "heating",
    "radiate_state",
    "step",
    "step_n",
    "run",
    "jacobian",
    "update_absorber",
    "convective_adjustment",
    "radiative_grid",
]
