"""Batched RCE sweeps: many columns, one device program (BASELINE config 5).

The reference runs one column at a time; here a whole grid of radiative-
convective columns — e.g. an insolation/orbit sweep across latitudes or
orbital parameters — integrates as a single vmapped, optionally mesh-sharded
program: columns ride the 'batch' mesh axis (data parallelism), the spectrum
rides 'nu' (model parallelism), and the physics code is exactly the
single-column :mod:`clearsky_tpu.models.rcm` — vmap does the batching.

Typical use composes with :mod:`clearsky_tpu.orbital`:

    theta, F = annualfluxfactors(e, gamma, p, ntheta=64)   # latitude factors
    out = run_sweep(rcm, F * S0, dt, nsteps)               # 64 columns at once
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from . import rcm as rcm_mod

__all__ = ["batched_heating", "run_sweep", "shard_sweep"]


def _with_insolation(rcm, factor):
    """Column variant of the template with scaled TOA stellar flux."""
    return dataclasses.replace(rcm, S_nu=rcm.S_nu * factor)


def batched_heating(rcm, T_b, factors):
    """Heating rates [batch, np] for a batch of columns.

    ``T_b`` [batch, np] are per-column temperatures; ``factors`` [batch] scale
    the template's stellar spectrum per column (insolation sweep). All other
    model structure (grids, absorbers, closures) is shared.
    """
    factors = jnp.asarray(factors)

    def one(T, f):
        return rcm_mod.heating(_with_insolation(rcm, f), T)

    return jax.vmap(one)(T_b, factors)


def run_sweep(
    rcm,
    factors,
    dt,
    nsteps: int,
    T0_b=None,
    update_every: int = 0,
    adjust_every: int = 0,
    cp: float | None = None,
    mu: float | None = None,
):
    """Integrate a batch of RCE columns with per-column insolation factors.

    Returns (T_b, A_b): final temperatures [batch, np] and per-column cached
    absorbers. The step body is the same composed loop as
    :func:`clearsky_tpu.models.rcm.run`, vmapped over columns and scanned over
    time on device.
    """
    factors = jnp.asarray(factors)
    nb = factors.shape[0]
    if T0_b is None:
        T0_b = jnp.broadcast_to(rcm.T, (nb,) + rcm.T.shape)
    if adjust_every and (cp is None or mu is None):
        raise ValueError("convective adjustment requires scalar cp and mu")

    from ..utils.interp import interp_linear
    from ..atmosphere.adiabats import lapse

    lnPe, lnP = jnp.log(rcm.Pe), jnp.log(rcm.P)
    A0_b = jax.vmap(lambda _: rcm.A)(jnp.arange(nb))  # stacked copies

    def col_step(T, A, f, i):
        H = rcm_mod.heating(_with_insolation(rcm, f), T, A)
        T = T + dt * H
        if adjust_every:
            T = lax.cond(
                (i + 1) % adjust_every == 0,
                lambda t: lapse(t, rcm.P, cp, mu),
                lambda t: t,
                T,
            )
        if update_every:
            Te = interp_linear(lnPe, lnP, T)
            A = lax.cond(
                (i + 1) % update_every == 0, lambda a: a.update(Te), lambda a: a, A
            )
        return T, A

    def body(carry, i):
        T_b, A_b = carry
        T_b, A_b = jax.vmap(col_step, in_axes=(0, 0, 0, None))(T_b, A_b, factors, i)
        return (T_b, A_b), None

    (T_b, A_b), _ = lax.scan(body, (T0_b, A0_b), jnp.arange(nsteps))
    return T_b, A_b


def shard_sweep(mesh, rcm, factors, T0_b=None):
    """Place sweep inputs on a ('batch', 'nu') mesh.

    Returns (rcm_sharded, factors_sharded, T0_b_sharded) ready for
    :func:`batched_heating`/:func:`run_sweep` under jit — XLA partitions the
    vmapped columns over 'batch' and every spectral array over 'nu'.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import shard_spectral
    from ..parallel.spectral import shard_lbl

    factors = jnp.asarray(factors)
    nb = factors.shape[0]
    if nb % mesh.shape["batch"] != 0:
        raise ValueError(
            f"batch size {nb} not divisible by batch-mesh size {mesh.shape['batch']}"
        )
    # line-by-line gases must shard as per-shard line slabs (like every
    # sharded program builder in parallel/spectral.py) — a global banding
    # plan against a sharded grid forces XLA to replicate the line sum
    rcm_s = shard_spectral(
        shard_lbl(rcm, mesh.shape["nu"]), mesh, rcm.nu.shape[0]
    )
    f_s = jax.device_put(factors, NamedSharding(mesh, P("batch")))
    if T0_b is None:
        T0_b = jnp.broadcast_to(rcm.T, (nb,) + rcm.T.shape)
    T_s = jax.device_put(T0_b, NamedSharding(mesh, P("batch", None)))
    return rcm_s, f_s, T_s
