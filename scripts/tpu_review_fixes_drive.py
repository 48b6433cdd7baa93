"""TPU drive for the round-2 code-review fixes (one script, one compile batch).

1. Sharded-slab d_near fix: sigma via the device-plan kernel on a PADDED slab
   (shard_line_gas(gas, 1) pads to a 128 multiple with nu=1e30 sentinels)
   must match the static-plan kernel, and — now that padding no longer
   inflates max(alpha) — run at comparable speed (before the fix the far
   sweep degenerated to empty and everything went through the w4 near sweep).
2. Oracle two-float positions: the Pallas kernel's custom JVP tangents route
   through the f32 oracle; drive jacobian(update_sigma=True) on a DirectGas
   column and check finiteness + fwd-vs-fd agreement on TPU.
3. resident_limit threading: a raised limit must keep the resident grouped
   path (matching default-path values), not fall to the gathered path.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
N_CHAIN = 32


def timed(fn, T0):
    @jax.jit
    def chained(T):
        def body(Tc, _):
            s = fn(Tc)
            return Tc + 1e-30 * s.sum(axis=1), None

        Tn, _ = lax.scan(body, T, None, length=N_CHAIN)
        return Tn

    float(chained(T0).sum())
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chained(T0 + 0.01 * i).sum())
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((T0 + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    return max(min(times) - min(rtts), 1e-9) / N_CHAIN


def main():
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.absorption.gas import DirectGas
    from clearsky_tpu.absorption.sharded import shard_line_gas
    from clearsky_tpu.ops.linesum_pallas import (
        sigma_from_lines_pallas, sigma_from_lines_pallas_device,
    )
    from clearsky_tpu.models import rcm as rcm_mod
    from clearsky_tpu.utils.grids import pressuregrid
    from clearsky_tpu.constants import R_GAS

    lines = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(lines.nu, np.float64)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, 32768)
    gas = DirectGas.from_lines(lines, 0.95, nu)
    n_states = 16
    T = jnp.asarray(np.linspace(180.0, 320.0, n_states), jnp.float32)
    P = jnp.asarray(np.geomspace(10.0, 1e5, n_states), jnp.float32)
    Pp = 0.95 * P

    # --- 1. padded device-plan slab vs static plan: values + speed ---------
    sg = shard_line_gas(gas, 1)  # pads the slab to a 128 multiple (nu=1e30)
    from clearsky_tpu.absorption.sharded import _slice_plan, _slice_lines

    dplan = _slice_plan(sg.plans, 0)
    slab = _slice_lines(sg.lines, 0)
    a = np.asarray(sigma_from_lines_pallas(gas.plan, lines, T, P, Pp, "voigt"))
    b = np.asarray(
        sigma_from_lines_pallas_device(dplan, slab, T, P, Pp, "voigt")
    )
    m = np.abs(a) > 1e-35
    rel = np.max(np.abs(b[m] - a[m]) / np.abs(a[m]))
    print(f"[1] padded-slab vs static values: max rel {rel:.2e}", flush=True)
    assert rel < 1e-5
    dt_s = timed(lambda Tc: sigma_from_lines_pallas(gas.plan, lines, Tc, P, Pp, "voigt"), T)
    dt_d = timed(lambda Tc: sigma_from_lines_pallas_device(dplan, slab, Tc, P, Pp, "voigt"), T)
    print(
        f"[1] static {dt_s*1e3:.2f} ms vs padded device-plan {dt_d*1e3:.2f} ms "
        f"(ratio {dt_d/dt_s:.2f}; ~1.0 = split active on the sharded path)",
        flush=True,
    )

    # --- 2. exact Jacobian through the f32 oracle tangents -----------------
    G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0
    nu_s = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, 4096)
    gas_s = DirectGas.from_lines(
        SpectralLines.from_par(CO2_PAR, maxlines=2000), 0.95, nu_s
    )
    Pe = pressuregrid(PT, PS, 16)
    Te = np.maximum(285.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    r = rcm_mod.RCM.create(
        Pe, Te, G, lambda Tq, Pq: MU, 0.0, 0.0, lambda Tq, Pq: CP, 1e7, gas_s
    )
    J = np.asarray(rcm_mod.jacobian(r, mode="fwd", update_sigma=True))
    Jfd = np.asarray(rcm_mod.jacobian(r, mode="fd", eps=0.5, update_sigma=True))
    assert np.all(np.isfinite(J)), "fwd Jacobian not finite"
    scale = np.abs(Jfd).max()
    dev = np.abs(J - Jfd).max() / scale
    print(f"[2] jacobian(update_sigma) fwd vs fd: max dev {dev:.2e} of peak", flush=True)
    assert dev < 5e-2

    # --- 3. resident_limit threading ---------------------------------------
    c = np.asarray(
        sigma_from_lines_pallas(
            gas.plan, lines, T, P, Pp, "voigt", resident_limit=48 * 2**20
        )
    )
    np.testing.assert_allclose(c[m], a[m], rtol=1e-6)
    print("[3] raised resident_limit keeps the resident path: values match", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
