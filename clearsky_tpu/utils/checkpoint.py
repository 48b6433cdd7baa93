"""Checkpoint/restore for baked gases and RCE state.

The reference has no in-package persistence — its docs point users at Julia's
``Serialization`` to save baked ``Gas`` objects (ref docs/src/gas_objects.md,
"Storing Gases"). Here persistence is first-class, since table baking is the
expensive initialization: flat ``.npz`` archives hold every array leaf plus a
JSON manifest of the static fields, so checkpoints are portable, inspectable,
and independent of Python pickling.

Supported objects: :class:`~clearsky_tpu.absorption.gas.Gas` (baked tables)
and RCM temperature-state snapshots. ``DirectGas`` needs no checkpoint — its
state is the line catalog, which reloads from the ``.par`` file faster than
any table bake.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from ..absorption.domain import AtmosphericDomain
from ..absorption.gas import Gas, as_concentration

__all__ = [
    "save_gas",
    "load_gas",
    "save_rcm_state",
    "load_rcm_state",
    "save_rcm_orbax",
    "load_rcm_orbax",
]

_FORMAT = "clearsky-tpu-gas-v1"


def save_gas(path: str, gas: Gas) -> None:
    """Save a baked Gas (table coefficients + domain + identity) to ``.npz``.

    The concentration closure is NOT serialized (it is arbitrary user code);
    pass ``fC`` to :func:`load_gas`, or reconcentrate after loading — this
    mirrors the reference's ``reconcentrate`` pattern (ref gases.jl:292-320).
    """
    d = gas.domain
    manifest = {
        "format": _FORMAT,
        "name": gas.name,
        "formula": gas.formula,
        "mu": gas.mu,
        "domain": {
            "Tmin": d.Tmin, "Tmax": d.Tmax, "nT": d.nT,
            "Pmin": d.Pmin, "Pmax": d.Pmax, "nP": d.nP,
        },
    }
    arrays = dict(
        manifest=np.frombuffer(json.dumps(manifest).encode(), dtype=np.uint8),
        nu=np.asarray(gas.nu),
        coeffs=np.asarray(gas.coeffs),
    )
    if gas.coeffs_tail is not None:
        # split-precision table: npz has no bfloat16, so the tail rides its
        # bit pattern (uint16); lead/tail row indices live in the manifest
        manifest["lead_idx"] = list(gas.lead_idx)
        manifest["tail_idx"] = list(gas.tail_idx)
        arrays["manifest"] = np.frombuffer(
            json.dumps(manifest).encode(), dtype=np.uint8
        )
        arrays["coeffs_tail_bits"] = (
            np.asarray(gas.coeffs_tail).view(np.uint16)
        )
    np.savez_compressed(path, **arrays)


def load_gas(path: str, fC=1.0) -> Gas:
    """Load a baked Gas saved by :func:`save_gas`, with concentration ``fC``."""
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
        if manifest.get("format") != _FORMAT:
            raise ValueError(f"not a clearsky-tpu gas checkpoint: {path}")
        dm = manifest["domain"]
        domain = AtmosphericDomain.create(
            (dm["Tmin"], dm["Tmax"]), dm["nT"], (dm["Pmin"], dm["Pmax"]), dm["nP"]
        )
        tail = None
        lead_idx = tail_idx = None
        if "coeffs_tail_bits" in z:
            import ml_dtypes

            tail = jnp.asarray(z["coeffs_tail_bits"].view(ml_dtypes.bfloat16))
            lead_idx = tuple(manifest["lead_idx"])
            tail_idx = tuple(manifest["tail_idx"])
        return Gas(
            nu=jnp.asarray(z["nu"]),
            coeffs=jnp.asarray(z["coeffs"]),
            name=manifest["name"],
            formula=manifest["formula"],
            mu=manifest["mu"],
            domain=domain,
            fC=as_concentration(fC),
            coeffs_tail=tail,
            lead_idx=lead_idx,
            tail_idx=tail_idx,
        )


def save_rcm_state(path: str, rcm) -> None:
    """Snapshot the prognostic RCE state (grids + temperatures + cached sigma)."""
    np.savez_compressed(
        path,
        Pe=np.asarray(rcm.Pe),
        P=np.asarray(rcm.P),
        T=np.asarray(rcm.T),
        Pr=np.asarray(rcm.Pr),
        ln_sigma=np.asarray(rcm.A.ln_sigma),
        A_T=np.asarray(rcm.A.T),
        nu=np.asarray(rcm.nu),
    )


def load_rcm_state(path: str, rcm):
    """Restore a snapshot into an existing RCM (validates grid compatibility).

    Returns a new RCM with the saved temperatures and cached cross-sections.
    The model skeleton (absorbers, closures, core) comes from ``rcm``; only
    state arrays are restored — the standard restart pattern for long RCE
    integrations.
    """
    with np.load(path) as z:
        for key, cur in (("Pe", rcm.Pe), ("Pr", rcm.Pr), ("nu", rcm.nu)):
            if z[key].shape != np.asarray(cur).shape or not np.allclose(
                z[key], np.asarray(cur)
            ):
                raise ValueError(f"checkpoint grid '{key}' does not match model")
        A = dataclasses.replace(
            rcm.A, ln_sigma=jnp.asarray(z["ln_sigma"]), T=jnp.asarray(z["A_T"])
        )
        return dataclasses.replace(rcm, T=jnp.asarray(z["T"]), A=A)


def _rcm_state_tree(rcm) -> dict:
    return {
        "Pe": rcm.Pe, "P": rcm.P, "T": rcm.T, "Pr": rcm.Pr,
        "ln_sigma": rcm.A.ln_sigma, "A_T": rcm.A.T, "nu": rcm.nu,
    }


def save_rcm_orbax(path: str, rcm) -> None:
    """Snapshot the RCE state with orbax (sharding-aware, multi-host safe).

    The orbax backend preserves device shardings and coordinates multi-host
    writes — the right choice for long sharded integrations; the ``.npz``
    backend (:func:`save_rcm_state`) stays the portable single-host format.
    Same skeleton-restore contract: only state arrays are saved.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _rcm_state_tree(rcm))


def load_rcm_orbax(path: str, rcm):
    """Restore an orbax snapshot into an existing RCM skeleton (validated)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, _rcm_state_tree(rcm))
    for key in ("Pe", "Pr", "nu"):
        if not np.allclose(np.asarray(state[key]), np.asarray(getattr(rcm, key))):
            raise ValueError(f"checkpoint grid '{key}' does not match model")
    A = dataclasses.replace(
        rcm.A, ln_sigma=jnp.asarray(state["ln_sigma"]), T=jnp.asarray(state["A_T"])
    )
    return dataclasses.replace(rcm, T=jnp.asarray(state["T"]), A=A)
