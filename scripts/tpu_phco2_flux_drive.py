"""Production-scale PHCO2 flux drive: full-spectrum OLR at 2^19 points with
the sub-Lorentzian Perrin-Hartmann CO2 shape (cut=500), comparing the
auto-routed coarse-far kernel against the default grouped kernel at the
whole-pipeline level (sigma -> tau -> Schwarzschild march -> OLR).

The phco2 shape is the reference's dense-CO2-atmosphere configuration
(ref line_shapes.jl:454-540); its 1000 cm^-1-wide windows make the far
zone ~99% of all (point, line) pairs — the regime the coarse split exists
for. Runs on the real TPU; prints one JSON report.
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.absorption.gas import DirectGas
from clearsky_tpu.absorption.absorbers import unify_absorbers
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.rt.fluxes import outgoing, _column_tau, _planck_levels
from clearsky_tpu.rt.discretized import outgoing_flux
from clearsky_tpu.atmosphere.profile import interp_linear
from clearsky_tpu.utils.grids import pressuregrid, trapz

PAR = "/root/reference/test/HITRAN"
G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0
N_NU = 524288


def timed_chain(fn, x0, K=4, reps=3):
    @jax.jit
    def chained(x):
        def body(c, _):
            y = fn(c)
            return c + 1e-30 * y.sum(), None
        c, _ = lax.scan(body, x, None, length=K)
        return c

    float(np.asarray(chained(x0)).sum())
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(chained(x0 + 0.01 * i)).sum())
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(np.asarray(jnp.asarray(1.0 * i) + 1.0).sum())
        rtts.append(time.perf_counter() - t0)
    return (min(times) - min(rtts)) / K


def main():
    t0 = time.time()
    rep = {"backend": jax.default_backend(), "n_nu": N_NU}
    co2 = SpectralLines.from_par(f"{PAR}/CO2.par")
    nu_l = np.asarray(co2.nu)
    nu = np.linspace(max(nu_l.min() - 500.0, 1.0), nu_l.max() + 500.0, N_NU)
    rep["n_lines"] = int(nu_l.shape[0])

    Pe = pressuregrid(PT, PS, 20)
    Te = np.maximum(285.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe = jnp.log(jnp.asarray(Pe))
    Tj = jnp.asarray(Te)
    fmu = lambda T, P: MU
    Pg = jnp.asarray(Pe)

    def olr_core(s, A):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        tau = _column_tau(Pg, G, fTs, fmu, A, 3)
        B = _planck_levels(Pg, A.nu, fTs)
        return outgoing_flux(tau, B, 5)

    x0 = jnp.asarray(0.0)
    bands = {}
    # "grouped" pins the pre-coarse default (split kernel); "auto" routes
    # phco2 through the coarse-far split
    for strat in ("grouped", "auto"):
        gas = DirectGas.from_lines(co2, 0.95, nu, shape="phco2",
                                   strategy=strat)
        A = unify_absorbers((gas,))
        dt = timed_chain(lambda s, _A=A: olr_core(s, _A), x0)
        olr = np.asarray(olr_core(x0, A))
        bands[strat] = float(np.trapezoid(olr, nu))
        rep[f"olr_s_{strat}"] = dt
        rep[f"olr_band_{strat}"] = bands[strat]
        print(f"[{time.time()-t0:7.1f}s] {strat}: {dt*1e3:.1f} ms/OLR, "
              f"band {bands[strat]:.4f} W/m^2", flush=True)
    rep["speedup"] = rep["olr_s_grouped"] / rep["olr_s_auto"]
    rep["band_rel_delta"] = abs(bands["auto"] - bands["grouped"]) / abs(
        bands["grouped"])
    print(json.dumps(rep, indent=1, default=float))


if __name__ == "__main__":
    main()
