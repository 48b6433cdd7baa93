"""Worker process for the multi-process multi-host test.

Launched by tests/test_multihost.py: each process owns 4 virtual CPU devices
(XLA_FLAGS set by the parent), joins the cluster through
``init_multihost(coordinator, num_processes, process_id)``, builds the global
('batch', 'nu') mesh over all 8 devices, and computes sharded heating on the
flagship DirectGas RCM. Rank 0 writes the result for the parent to compare
against the single-process answer.

Usage: python multihost_worker.py <coordinator> <nprocs> <rank> <out.npz>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def build_rcm():
    from clearsky_tpu.absorption.gas import DirectGas
    from clearsky_tpu.constants import R_GAS
    from clearsky_tpu.models.rcm import RCM
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.utils.grids import pressuregrid

    G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0
    lines = SpectralLines.from_par(
        "/root/reference/test/HITRAN/CO2.par", maxlines=200
    )
    nu_l = np.asarray(lines.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, 64)
    gas = DirectGas.from_lines(lines, 0.9, nu)
    Pe = pressuregrid(PT, PS, 8)
    Te = np.maximum(280.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 150.0)
    return RCM.create(
        Pe, Te, G, lambda T, P: MU, 1e-3, 0.1, lambda T, P: CP, 1e7, gas
    )


def main():
    coordinator, nprocs, rank, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    from clearsky_tpu.parallel import (
        init_multihost, spectral_mesh, make_sharded_heating, make_sharded_step,
    )
    from clearsky_tpu.models import rcm as rcm_mod

    pi, pc = init_multihost(coordinator, num_processes=nprocs, process_id=rank)
    assert (pi, pc) == (rank, nprocs), (pi, pc)
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == nprocs * n_local, (n_global, n_local)

    r = build_rcm()
    mesh = spectral_mesh(n_batch=2)  # ('batch', 'nu') = (2, 4) over 8 devices
    hfn = make_sharded_heating(mesh, r)
    H = hfn(r.T)
    jax.block_until_ready(H)
    # out_specs=P() -> fully replicated: every process holds the whole array
    H_np = np.asarray(H)

    # two sharded RCE steps as well (DCN collective executes repeatedly)
    sfn = make_sharded_step(mesh, r, dt=300.0, update_every=1)

    # audit the MULTI-PROCESS compiled HLO: when the mesh spans processes the
    # collectives lower across DCN, where XLA could in principle insert extra
    # communication — the single-process one-all-reduce assertion
    # (tests/test_parallel.py) does not cover that lowering. Count here and
    # let the parent assert from the log.
    import re
    from collections import Counter

    rs, ws = sfn.bound_args
    hlo = sfn.jitted.lower(
        rs, ws, r.T, rs.A, jax.numpy.asarray(0)
    ).compile().as_text()
    cc = Counter(re.findall(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
        r"(?:-start|-done)?\(",
        hlo,
    ))
    n_ar = cc.get("all-reduce", 0)
    n_other = sum(v for k, v in cc.items() if k != "all-reduce")

    T, A = r.T, sfn.rcm_sharded.A
    for i in range(2):
        T, A = sfn(T, A, i)
    T_np = np.asarray(jax.block_until_ready(T))

    if rank == 0:
        np.savez(out_path, H=H_np, T2=T_np, n_global=n_global, n_local=n_local)
    # every process must agree (replicated outputs); emit a checksum so the
    # parent can cross-check rank consistency from the logs
    print(f"rank {rank}/{nprocs}: devices {n_local} local / {n_global} global "
          f"H_sum={H_np.sum():.17e} T2_sum={T_np.sum():.17e} "
          f"n_allreduce={n_ar} n_other_collectives={n_other}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
