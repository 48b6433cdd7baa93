"""TPU A/B: split-precision (f32 lead + bf16 tail) vs full-f32 opacity tables
at production scale (BASELINE config 2, 2^19 points).

Measures (round 5, VERDICT r4 #1):
  * sigma-eval contraction time, full vs split (the dominant HBM byte term:
    604 MB f32 coeffs -> ~320 MB split)
  * end-to-end table OLR pipeline time, full vs split
  * accuracy: sigma max-rel on the column states (mask > 1e-8 peak) and
    band-integrated OLR delta, split vs full

Timing per CLAUDE.md: K-call jit chains with a data dependency + forced
readback, min-of-reps, RTT subtracted.

Run: timeout 3000 python scripts/tpu_split_precision_drive.py  (background)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.absorption.gas import Gas
from clearsky_tpu.absorption.domain import AtmosphericDomain
from clearsky_tpu.absorption.absorbers import unify_absorbers
from clearsky_tpu.constants import R_GAS
from clearsky_tpu.utils.grids import pressuregrid, trapz
from clearsky_tpu.utils.interp import interp_linear
from clearsky_tpu.rt.fluxes import _column_tau, _planck_levels
from clearsky_tpu.rt.discretized import outgoing_flux

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0


def time_chain(make_chain, x0, K, reps=3):
    ch = make_chain(K)
    float(np.asarray(ch(x0)))  # compile + settle
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(ch(x0 + 0.01 * i)))
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((x0 + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    return max(min(times) - min(rtts), 1e-9) / K


def main(n_nu=524288, nlev=20):
    co2 = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(co2.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, n_nu)
    Pe = pressuregrid(PT, PS, nlev)
    Te = np.maximum(288.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe, Tj, Pg = jnp.log(jnp.asarray(Pe)), jnp.asarray(Te), jnp.asarray(Pe)
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)

    t0 = time.time()
    gas = Gas.from_lines(co2, 0.95, nu, dom)
    print(f"bake: {time.time() - t0:.1f} s; coeffs {gas.coeffs.shape} "
          f"{gas.coeffs.dtype}", flush=True)
    gsp = gas.split_precision(16)
    A_full = unify_absorbers((gas,))
    A_split = unify_absorbers((gsp,))
    fT = lambda P: interp_linear(jnp.log(P), lnPe, Tj)

    # --- accuracy on the column's Lobatto states -------------------------
    from clearsky_tpu.rt.discretized import lobatto_pressures

    Pn = lobatto_pressures(Pg, 3).reshape(-1)
    Tn = fT(Pn)

    @jax.jit
    def sig_pair(A1, A2):
        s1 = A1.sigma(Tn, Pn)
        s2 = A2.sigma(Tn, Pn)
        pk = s1.max()
        mask = s1 > 1e-8 * pk
        rel = jnp.where(mask, jnp.abs(s2 - s1) / jnp.maximum(s1, 1e-30),
                        jnp.nan)
        return jnp.nanmax(rel), jnp.nanquantile(rel, 0.99, method="nearest")

    try:
        mx, p99 = sig_pair(A_full, A_split)
        print(f"sigma split-vs-full: max rel {float(mx):.3e}, p99 {float(p99):.3e}",
              flush=True)
    except Exception as e:
        print("sigma accuracy probe failed:", repr(e)[:200], flush=True)

    # --- OLR spectra + band values --------------------------------------
    def olr_core(s, A):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        tau = _column_tau(Pg, G, fTs, lambda T, P: MU, A, 3)
        B = _planck_levels(Pg, A.nu, fTs)
        return outgoing_flux(tau, B, 5)

    olr_f = jax.jit(lambda A: olr_core(0.0, A))
    spec_full = olr_f(A_full)
    spec_split = olr_f(A_split)
    band_full = float(trapz(jnp.asarray(nu), spec_full))
    band_split = float(trapz(jnp.asarray(nu), spec_split))
    pk = float(jnp.max(spec_full))
    ptw = float(jnp.max(jnp.abs(spec_split - spec_full))) / pk
    print(f"band OLR: full {band_full:.4f} split {band_split:.4f} W/m^2 "
          f"(rel {abs(band_split-band_full)/band_full:.2e}); "
          f"pointwise max {ptw:.2e} of peak", flush=True)

    # --- timings ---------------------------------------------------------
    x0 = jnp.asarray(0.0)

    # A must be a TRACED argument of the jitted chains: closure capture
    # turns the ~600 MB coefficient tensor into an HLO constant and blows
    # the remote-compile payload limit (CLAUDE.md gotcha, observed HTTP 413)
    def make_sigma_chain(K):
        @jax.jit
        def ch(x, A):
            def body(c, _):
                s = A.sigma(Tn + 1e-12 * c, Pn)
                return c + 1e-30 * s.sum(), None
            c, _ = lax.scan(body, x, None, length=K)
            return c
        return ch

    def make_olr_chain(K):
        @jax.jit
        def ch(x, A):
            def body(c, _):
                return c + 1e-30 * olr_core(c, A).sum(), None
            c, _ = lax.scan(body, x, None, length=K)
            return c
        return ch

    for name, A, K in (("sigma full", A_full, 48), ("sigma split", A_split, 48),
                       ("olr full", A_full, 32), ("olr split", A_split, 32)):
        ch = (make_olr_chain if name.startswith("olr") else make_sigma_chain)(K)
        dt = time_chain(lambda _K, _c=ch, _A=A: (lambda x: _c(x, _A)), x0, K)
        print(f"{name:12s}: {dt*1e3:7.3f} ms/call (K={K})", flush=True)


if __name__ == "__main__":
    main()
