"""Stage-level roofline of the production flux pipeline (configs 2-3).

VERDICT r3 #1: the kernel has a cost model, the pipeline does not. This
script splits the end-to-end table-mode OLR (measured 11.4 ms/call at 2^19
in round 3) and the direct-mode variant into their stages, times each on the
chip with the K-chained pattern (the async relay makes single-call timing
meaningless, see CLAUDE.md), and prints measured-vs-roofline milliseconds
per stage plus an end-to-end fraction_of_roof.

Stages (table mode, ref fluxes.jl:195-404 is the end-to-end anchor):
  basis_matmul   [L,288] @ [288,N] Chebyshev contraction (MXU + 604 MB read)
  exp            exp(ln_sigma) [L,N]
  sigma_total    A.sigma(Tn, Pn) -- matmul + exp + concentration fused by XLA
  layer_tau      Lobatto-weighted reduction [L,N] -> [nlayer,N]
  planck         Planck B at levels [np,N]
  march_outgoing outgoing_flux(tau, B, 5)  (the up-march scan)
  march_mono     monoflux(tau, B, ...) (both marches + beam + surface)
  e2e_olr        the whole olr_core (config 2)
  e2e_fluxes     the whole fluxes_core (config 3, table mode)

Direct mode replaces sigma_total with the pallas line-sum dispatch.

Bytes model: f32 HBM traffic per stage assuming perfect fusion (each
materialized array read/written once); roof = bytes / 0.82 TB/s (v5e) with
an MXU term for the contraction. Stages whose measured time sits well above
their byte roof are the optimization targets.

Usage: python scripts/flux_pipeline_roofline.py [--nnu 524288] [--nlev 20]
       [--smoke]  (--smoke: tiny CPU run to validate plumbing)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

PAR_DIR = "/root/reference/test/HITRAN"
G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0
HBM_BPS = 0.82e12  # v5e
MXU_F32 = 4.9e13   # v5e f32-via-bf16-passes matmul floor (conservative)


def timed_chain(make_fn, x0, K, extra, reps=3):
    """min wall of a K-chained jit minus min-of-5 RTT, per call (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(x, extra):
        def body(c, _):
            y = make_fn(c, extra)
            return c + 1e-30 * jnp.real(y).sum(), None

        c, _ = lax.scan(body, x, None, length=K)
        return c

    float(np.asarray(chained(x0, extra)))  # compile + settle
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(chained(x0 + 0.01 * i, extra)))
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
    ap.add_argument("--nlev", type=int, default=20)
    ap.add_argument("--skip-direct", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.nnu, args.nlev = 2048, 12

    import jax
    import jax.numpy as jnp
    from clearsky_tpu.spectra.lines import SpectralLines
    from clearsky_tpu.absorption.gas import DirectGas, Gas
    from clearsky_tpu.absorption.domain import AtmosphericDomain
    from clearsky_tpu.absorption.absorbers import unify_absorbers
    from clearsky_tpu.constants import R_GAS
    from clearsky_tpu.utils.grids import pressuregrid, trapz
    from clearsky_tpu.utils.interp import interp_linear, cheb_basis
    from clearsky_tpu.rt.fluxes import _column_tau, _planck_levels
    from clearsky_tpu.rt.discretized import (
        lobatto_pressures, layer_tau, monoflux, outgoing_flux,
    )

    N, nlev = args.nnu, args.nlev
    rep = {"backend": jax.default_backend(), "n_nu": N, "nlev": nlev}
    t0 = time.time()
    co2 = SpectralLines.from_par(f"{PAR_DIR}/CO2.par")
    lo, hi = float(np.asarray(co2.nu).min()), float(np.asarray(co2.nu).max())
    nu = np.linspace(max(lo - 25.0, 1.0), hi + 25.0, N)

    Pe = pressuregrid(PT, PS, nlev)
    Te = np.maximum(288.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe = jnp.log(jnp.asarray(Pe))
    Tj = jnp.asarray(Te)
    fmu = lambda T, P: MU

    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    gas_t = Gas.from_lines(co2, 0.95, nu, dom)
    jax.block_until_ready(gas_t.coeffs)
    A_t = unify_absorbers((gas_t,))
    print(f"[{time.time()-t0:6.1f}s] table baked", flush=True)

    Pg = jnp.asarray(Pe)
    Pn = lobatto_pressures(Pg, 3)                       # [nlay, 3]
    Tn = interp_linear(jnp.log(Pn), lnPe, Tj)
    mun = jnp.full_like(Tn, MU)
    L = Tn.shape[0] * Tn.shape[1]
    nlay = nlev - 1
    d = gas_t.domain
    nc = gas_t.coeffs.shape[0]

    GB = 1e9
    x0 = jnp.asarray(0.0)
    rows = []

    def stage(name, fn, extra, K, bytes_model, flops_mxu=0.0, note=""):
        dt = timed_chain(fn, x0, K, extra)
        roof = max(bytes_model / HBM_BPS, flops_mxu / MXU_F32)
        rows.append({
            "stage": name, "ms": dt * 1e3, "bytes_GB": bytes_model / GB,
            "roof_ms": roof * 1e3,
            "x_roof": dt / roof if roof > 0 else float("inf"),
            "note": note,
        })
        print(f"  {name:16s} {dt*1e3:8.3f} ms   roof {roof*1e3:7.3f} ms "
              f"({dt/max(roof,1e-12):5.1f}x)  {note}", flush=True)
        return dt

    # --- stage: Chebyshev basis matmul (the 604 MB coefficient read) ---
    BT = cheb_basis(Tn.reshape(-1), d.Tmin, d.Tmax, d.nT)
    BP = cheb_basis(jnp.log(Pn.reshape(-1)), np.log(d.Pmin), np.log(d.Pmax), d.nP)
    basis = (BT[:, :, None] * BP[:, None, :]).reshape(L, -1)   # [L, 288]

    def f_matmul(c, ex):
        b, coef = ex
        return (b + 1e-30 * c) @ coef

    by = (nc * N + L * N) * 4
    stage("basis_matmul", f_matmul, (basis, gas_t.coeffs), 128, by,
          flops_mxu=2.0 * L * nc * N, note=f"[{L},{nc}]@[{nc},{N}]")

    # --- stage: exp on the contraction output ---
    ln0 = basis @ gas_t.coeffs

    def f_exp(c, ex):
        return jnp.exp(ex + 1e-30 * c)

    stage("exp", f_exp, ln0, 128, (L * N * 2) * 4, note=f"[{L},{N}] transcendental")

    # --- stage: full sigma through the absorber stack ---
    def f_sigma(c, ex):
        return ex.sigma(Tn + 1e-12 * c, Pn)

    stage("sigma_total", f_sigma, A_t, 96, (nc * N + L * N) * 4,
          flops_mxu=2.0 * L * nc * N, note="matmul+exp+conc fused")

    # --- stage: layer_tau from a materialized sigma ---
    sig0 = A_t.sigma(Tn, Pn)
    jax.block_until_ready(sig0)

    def f_tau(c, ex):
        return layer_tau(Pg, Tn, mun, ex * (1.0 + 1e-30 * c), G, 3)

    stage("layer_tau", f_tau, sig0, 128, (L * N + nlay * N) * 4,
          note=f"[{nlay},3,{N}] -> [{nlay},{N}]")

    # --- stage: Planck at levels ---
    def f_planck(c, ex):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * c)
        return _planck_levels(Pg, ex, fTs)

    stage("planck", f_planck, gas_t.nu, 128, (N + nlev * N) * 4,
          note=f"[{nlev},{N}]")

    # --- stage: the outgoing up-march ---
    tau0 = layer_tau(Pg, Tn, mun, sig0, G, 3)
    B0 = _planck_levels(Pg, gas_t.nu, lambda P: interp_linear(jnp.log(P), lnPe, Tj))
    jax.block_until_ready(tau0)

    def f_march(c, ex):
        tau, B = ex
        return outgoing_flux(tau * (1.0 + 1e-30 * c), B, 5)

    # ideal-fusion bytes: read tau + B once, write the TOA spectrum
    stage("march_outgoing", f_march, (tau0, B0), 96,
          (nlay * N + nlev * N + N) * 4, note="up-march scan, 5 streams")

    # --- stage: the full monoflux pair of marches ---
    S_nu = jnp.full((N,), 1.0)
    a_nu = jnp.full((N,), 0.1)

    def f_mono(c, ex):
        tau, B = ex
        up, dn = monoflux(tau * (1.0 + 1e-30 * c), B, gas_t.nu, S_nu, a_nu,
                          0.841, 5)
        return up.sum(axis=0) + dn.sum(axis=0)

    stage("march_mono", f_mono, (tau0, B0), 48,
          (nlay * N + nlev * N + 2 * nlev * N) * 4,
          note="both marches + beam + surface")

    # --- end-to-end config-2 table OLR ---
    def olr_core(s, A):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        tau = _column_tau(Pg, G, fTs, fmu, A, 3)
        B = _planck_levels(Pg, A.nu, fTs)
        return outgoing_flux(tau, B, 5)

    by_e2e = (nc * N            # coefficient read
              + 2 * L * N       # ln write + read into exp/tau fusion
              + nlay * N        # tau
              + nlev * N        # B
              + N) * 4          # TOA spectrum
    dt_e2e = stage("e2e_olr_table", olr_core, A_t, 48, by_e2e,
                   flops_mxu=2.0 * L * nc * N, note="config-2 table mode")
    rep["e2e_olr_table_ms"] = dt_e2e * 1e3

    # --- end-to-end config-3-style fluxes (single gas, table mode) ---
    def fluxes_core(s, A):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        tau = _column_tau(Pg, G, fTs, fmu, A, 3)
        B = _planck_levels(Pg, A.nu, fTs)
        up, dn = monoflux(tau, B, A.nu, S_nu, a_nu, 0.841, 5)
        return trapz(A.nu, up - dn)

    dt_f = stage("e2e_fluxes_table", fluxes_core, A_t, 24,
                 (nc * N + 2 * L * N + nlay * N + 3 * nlev * N) * 4,
                 flops_mxu=2.0 * L * nc * N, note="config-3-shape, 1 gas")
    rep["e2e_fluxes_table_ms"] = dt_f * 1e3

    # --- direct mode: pallas sigma + e2e ---
    if not args.skip_direct:
        gas_d = DirectGas.from_lines(co2, 0.95, nu)
        A_d = unify_absorbers((gas_d,))

        def f_sigma_d(c, ex):
            return ex.sigma(Tn + 1e-12 * c, Pn)

        stage("sigma_direct", f_sigma_d, A_d, 8, (L * N * 1) * 4,
              note="pallas line-sum, 57 states")
        dt_de = stage("e2e_olr_direct", olr_core, A_d, 8,
                      (2 * L * N + nlay * N + nlev * N + N) * 4,
                      note="config-2 direct mode")
        rep["e2e_olr_direct_ms"] = dt_de * 1e3

    rep["rows"] = rows
    # pipeline fraction-of-roof: ideal-fusion byte roof over measured
    ideal = by_e2e / HBM_BPS
    rep["e2e_olr_table_roof_ms"] = ideal * 1e3
    rep["e2e_olr_table_fraction_of_roof"] = ideal / dt_e2e
    print(json.dumps(rep, indent=1, default=float))


if __name__ == "__main__":
    main()
