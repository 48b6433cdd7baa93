"""BASELINE config-4 north star ON THE CHIP: 1000-step RCE in f32 vs the
frozen f64 adaptive oracle.

The CPU suite asserts the full 1000-step trajectory in float64
(tests/test_rce_oracle.py); this drives the IDENTICAL configuration (full
CO2+H2O fused MultiGas + CO2-CO2 CIA, 20 levels, 1024 nu, radmul 2, both
user-loop cadences active) on the real TPU in float32 — the production
precision — and measures the trajectory deviation against the same golden
artifact (tests/golden/config4_oracle_1000step.npz). This is the literal
north-star criterion ("allclose match to prognostic temperature profiles
after 1000 radiative-convective steps") executed at production precision on
production hardware.

Usage: python scripts/tpu_rce_config4_drive.py [--steps 1000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

PAR = "/root/reference/test/HITRAN"
G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=100,
                    help="record/readback chunk (steps per device scan)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.absorption.gas import MultiGas
    from clearsky_tpu.absorption.cia import CIATables
    from clearsky_tpu.constants import R_GAS
    from clearsky_tpu.models import rcm as rcm_mod
    from clearsky_tpu.utils.grids import pressuregrid

    gold = np.load(os.path.join("tests", "golden",
                                "config4_oracle_1000step.npz"))
    meta = json.loads(str(gold["meta"]))
    NS = min(args.steps, int(meta["steps"]))
    DT, UE, AE = 2e4, int(meta["update_every"]), int(meta["adjust_every"])
    import math

    cadence = math.lcm(UE, AE)
    if args.chunk % cadence:
        raise SystemExit(
            f"--chunk must be a multiple of lcm(update_every, adjust_every)"
            f" = {cadence}: run() restarts its local step counter per chunk,"
            f" so any other chunk silently shifts the refresh/adjust phase"
            f" relative to the frozen oracle"
        )
    nnu = int(meta["nnu"])

    t0 = time.time()
    co2 = SpectralLines.from_par(f"{PAR}/CO2.par")
    h2o = SpectralLines.from_par(f"{PAR}/H2O.par")
    nu_l = np.asarray(co2.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, nnu)
    mg = MultiGas.from_lines([(co2, 0.9), (h2o, 0.005)], nu)
    cia = CIATables.from_file(f"{PAR}/CO2-CO2_2018.cia")
    Pe = pressuregrid(PT, PS, 20)
    Te = np.maximum(285.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    r = rcm_mod.RCM.create(
        Pe, Te, G, lambda T, P: MU, 0.0, 0.0, lambda T, P: CP, 1e7, mg, cia,
        radmul=2,
    )
    print(f"[{time.time()-t0:6.1f}s] built (backend {jax.default_backend()}, "
          f"dtype {jnp.asarray(1.0).dtype}), running {NS} steps", flush=True)

    recs = []
    state = r
    t1 = time.time()
    done = 0
    while done < NS:
        k = min(args.chunk, NS - done)
        out, rec = rcm_mod.run(
            state, DT, k, update_every=UE, adjust_every=AE, cp=CP, mu=MU,
            record_every=1,
        )
        recs.append(np.asarray(rec, dtype=np.float64))
        state = out
        done += k
        print(f"[{time.time()-t0:6.1f}s] {done}/{NS} steps", flush=True)
    wall = time.time() - t1
    traj = np.concatenate(recs)[:NS]
    ref = gold["traj"][:NS]
    dT = np.abs(traj - ref)
    rep = {
        "backend": jax.default_backend(),
        "steps": NS,
        "wall_s": wall,
        "ms_per_step": wall / NS * 1e3,
        "max_dT_K": float(dT.max()),
        "radiative_levels_max_dT_K": float(dT[:, :14].max()),
        "mean_dT_K": float(dT.mean()),
        "final_step_max_dT_K": float(dT[-1].max()),
        "final_surface_dT_K": float(dT[-1, -1]),
        "finite": bool(np.all(np.isfinite(traj))),
    }
    print(json.dumps(rep, indent=1))
    # the SAME bars as the CPU f64 suite (tests/test_rce_oracle.py): after
    # the round-4 CIA f32-subnormal fix, f32 matches the f64 oracle class
    # (measured f32: max 3.009 / radiative 0.459 / final 1.701 / surface
    # 0.076 K vs f64: 3.01 / 0.46 / 1.70 / 0.08)
    assert rep["finite"]
    assert rep["max_dT_K"] < 4.5, rep
    assert rep["radiative_levels_max_dT_K"] < 1.0, rep
    assert rep["final_step_max_dT_K"] < 2.5, rep
    assert rep["final_surface_dT_K"] < 0.3, rep
    print("TPU CONFIG-4 NORTH STAR: PASS")


if __name__ == "__main__":
    main()
