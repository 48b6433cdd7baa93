"""Production-scale end-to-end TPU flux measurement (BASELINE configs 2-3).

The reference's working regime is full catalogs over arbitrary dense grids
(ref gases.jl:97-145, fluxes.jl:195-404); this drives the whole pipeline at
that scale on the chip:

  * config 2: CO2-only `outgoing` (OLR spectrum) at >= 2^19 wavenumbers,
    full fixture catalog (5,599 lines), direct (line-by-line per call) AND
    baked-table mode;
  * config 3: CO2+H2O fused MultiGas + CO2-CO2 CIA `fluxes` (full up/down
    flux profiles) at the same scale, both modes;
  * table-vs-direct accuracy at that scale (sigma and band-integrated OLR).

Usage: python scripts/tpu_fullspectrum_drive.py [--nnu 524288] [--smoke]
(--smoke: tiny CPU run to validate the plumbing).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

PAR_DIR = "/root/reference/test/HITRAN"
G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0


def timed_chain(make_fn, x0, K, reps=3, extra=None):
    """min wall of a K-chained jit with data dependency, minus min-of-5 RTT.

    K must put >= ~100 ms of work on the chip per chain: round 3 used K=2-4
    here and the interleaved re-measurement in round 4 showed +-3 ms RTT
    jitter on such chains, which dominated the sub-10 ms table-mode rows.

    ``extra`` (e.g. the absorber pytree) is passed as a TRACED argument —
    closure-capturing a baked table's 600 MB coefficient tensor turns it
    into an HLO constant and blows the remote-compile request limit.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(x, extra):
        def body(c, _):
            y = make_fn(c, extra)
            return c + 1e-30 * y.sum(), None
        c, _ = lax.scan(body, x, None, length=K)
        return c

    float(np.asarray(chained(x0, extra)).sum())  # compile + settle
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(chained(x0 + 0.01 * i, extra)).sum())
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((x0 + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    return max(min(times) - min(rtts), 1e-9) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnu", type=int, default=524288)
    ap.add_argument("--nlev", type=int, default=40)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.nnu, args.nlev = 2048, 12

    import jax
    import jax.numpy as jnp
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.absorption.gas import DirectGas, MultiGas, Gas
    from clearsky_tpu.absorption.domain import AtmosphericDomain
    from clearsky_tpu.absorption.cia import CIATables
    from clearsky_tpu.constants import R_GAS
    from clearsky_tpu.rt.fluxes import outgoing, fluxes
    from clearsky_tpu.utils.grids import pressuregrid, trapz
    from clearsky_tpu.utils.interp import interp_linear

    rep = {"backend": jax.default_backend(), "n_nu": args.nnu}
    t0 = time.time()
    co2 = SpectralLines.from_par(f"{PAR_DIR}/CO2.par")
    h2o = SpectralLines.from_par(f"{PAR_DIR}/H2O.par")
    lo = min(float(np.asarray(co2.nu).min()), float(np.asarray(h2o.nu).min()))
    hi = max(float(np.asarray(co2.nu).max()), float(np.asarray(h2o.nu).max()))
    nu = np.linspace(max(lo - 25.0, 1.0), hi + 25.0, args.nnu)
    rep["nu_range"] = [float(nu[0]), float(nu[-1])]
    rep["n_lines_co2"] = int(np.asarray(co2.nu).shape[0])
    rep["n_lines_h2o"] = int(np.asarray(h2o.nu).shape[0])

    # column state (dry adiabat + isothermal floor)
    Pe = pressuregrid(PT, PS, args.nlev)
    Te = np.maximum(288.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe = jnp.log(jnp.asarray(Pe))
    Tj = jnp.asarray(Te)
    fT = lambda P: interp_linear(jnp.log(P), lnPe, Tj)
    fmu = lambda T, P: MU

    # --- config 2: CO2-only OLR, direct mode ---
    co2_direct = DirectGas.from_lines(co2, 0.95, nu)
    print(f"[{time.time()-t0:6.1f}s] absorbers built", flush=True)

    # The public one-shot wrappers (rt.fluxes.outgoing/fluxes) do host-side
    # setup (grid checks, plan building) that is once-per-model in
    # production; the timed quantity is their jitted compute core, with the
    # chain dependency riding the temperature profile so iterations
    # serialize on device.
    from clearsky_tpu.rt.fluxes import _column_tau, _planck_levels
    from clearsky_tpu.rt.discretized import outgoing_flux, monoflux
    from clearsky_tpu.absorption.absorbers import unify_absorbers

    Pg = jnp.asarray(Pe)

    def olr_core(s, A):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        tau = _column_tau(Pg, G, fTs, fmu, A, 3)
        B = _planck_levels(Pg, A.nu, fTs)
        return outgoing_flux(tau, B, 5)

    x0 = jnp.asarray(0.0)
    dt_direct = timed_chain(olr_core, x0, K=8,
                            extra=unify_absorbers((co2_direct,)))
    rep["olr_direct_s"] = dt_direct
    olr_direct = np.asarray(outgoing(np.asarray(Pe), G, fT, fmu, co2_direct))
    rep["olr_direct_band"] = float(np.trapezoid(olr_direct, nu))
    print(f"[{time.time()-t0:6.1f}s] config2 direct: {dt_direct:.3f} s/call, "
          f"band {rep['olr_direct_band']:.4f} W/m^2", flush=True)

    # --- config 2: table mode (bake once, then cheap evaluations) ---
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    t_b = time.time()
    co2_table = Gas.from_lines(co2, 0.95, nu, dom)
    jax.block_until_ready(co2_table.coeffs)
    rep["bake_s_co2"] = time.time() - t_b
    dt_table = timed_chain(olr_core, x0, K=64,
                           extra=unify_absorbers((co2_table,)))
    rep["olr_table_s"] = dt_table
    olr_table = np.asarray(outgoing(np.asarray(Pe), G, fT, fmu, co2_table))
    rep["olr_table_band"] = float(np.trapezoid(olr_table, nu))
    rep["olr_table_vs_direct_band_rel"] = float(
        abs(rep["olr_table_band"] - rep["olr_direct_band"]) / rep["olr_direct_band"]
    )
    rep["olr_table_vs_direct_peak_rel"] = float(
        np.abs(olr_table - olr_direct).max() / olr_direct.max()
    )
    # sigma accuracy at a mid-column state
    sd = np.asarray(co2_direct.raw_sigma(jnp.asarray(250.0), jnp.asarray(1e4)))
    st = np.asarray(co2_table.raw_sigma(jnp.asarray(250.0), jnp.asarray(1e4)))
    m = sd > sd.max() * 1e-8
    rep["sigma_table_vs_direct_max_rel(sig>1e-8max)"] = float(
        (np.abs(st - sd)[m] / sd[m]).max()
    )
    print(f"[{time.time()-t0:6.1f}s] config2 table: bake {rep['bake_s_co2']:.1f}s, "
          f"{dt_table:.3f} s/call", flush=True)

    # --- config 3: CO2+H2O+CIA full fluxes, direct mode ---
    mg = MultiGas.from_lines([(co2, 0.95), (h2o, 0.005)], nu)
    cia = CIATables.from_file(f"{PAR_DIR}/CO2-CO2_2018.cia")
    S0 = 340.0 / np.cos(0.841)
    span = float(nu[-1] - nu[0])
    fS = lambda v: jnp.full(jnp.shape(v), S0 / span)

    def fluxes_core(s, A):
        S_nu = fS(A.nu)
        a_nu = jnp.full_like(A.nu, 0.1)
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        tau = _column_tau(Pg, G, fTs, fmu, A, 3)
        B = _planck_levels(Pg, A.nu, fTs)
        M_up, M_down = monoflux(tau, B, A.nu, S_nu, a_nu, 0.841, 5)
        return trapz(A.nu, M_up - M_down)

    dt_flux_direct = timed_chain(fluxes_core, x0, K=8,
                                 extra=unify_absorbers((mg, cia)))
    rep["fluxes_direct_s"] = dt_flux_direct
    from clearsky_tpu.rt.fluxes import net_fluxes
    Fnet_direct = np.asarray(net_fluxes(np.asarray(Pe), G, fT, fmu, fS, 0.1, mg, cia))
    rep["fluxes_direct_Fnet_toa"] = float(Fnet_direct[0])
    print(f"[{time.time()-t0:6.1f}s] config3 direct: {dt_flux_direct:.3f} s/call",
          flush=True)

    # --- config 3: table mode (both gases baked; CIA stays interpolation) ---
    t_b = time.time()
    co2_t = Gas.from_lines(co2, 0.95, nu, dom)
    h2o_t = Gas.from_lines(h2o, 0.005, nu, dom)
    jax.block_until_ready(h2o_t.coeffs)
    rep["bake_s_both"] = time.time() - t_b
    dt_flux_table = timed_chain(fluxes_core, x0, K=32,
                                extra=unify_absorbers((co2_t, h2o_t, cia)))
    rep["fluxes_table_s"] = dt_flux_table
    Fnet_table = np.asarray(net_fluxes(np.asarray(Pe), G, fT, fmu, fS, 0.1, co2_t, h2o_t, cia))
    rep["fluxes_table_vs_direct_of_toa"] = float(
        np.abs(Fnet_table - Fnet_direct).max() / abs(Fnet_direct[0])
    )
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
