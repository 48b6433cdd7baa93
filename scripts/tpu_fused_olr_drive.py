"""TPU drive: the fully-fused table-OLR kernel (rt.fused_table) at
production scale (BASELINE config 2, 2^19 points, 20 levels, nstream 5).

Measures ms/call for (a) the standard unfused split-precision pipeline
(_column_tau + planck + outgoing_flux), (b) the fused kernel, plus
accuracy of fused vs unfused (pointwise of peak and band OLR).

Run: timeout 3000 python scripts/tpu_fused_olr_drive.py   (background)
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
from clearsky_tpu.rt.fused_table import table_olr_fused

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"
G, MU, CP, PS, PT = 9.8, 0.044, 850.0, 1e5, 10.0


def main(n_nu=524288, nlev=20, K=32):
    co2 = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(co2.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, n_nu)
    Pe = pressuregrid(PT, PS, nlev)
    Te = np.maximum(288.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe, Tj, Pg = jnp.log(jnp.asarray(Pe)), jnp.asarray(Te), jnp.asarray(Pe)
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    t0 = time.time()
    gas = Gas.from_lines(co2, 0.95, nu, dom)
    gsp = gas.split_precision(16)
    print(f"bake+split: {time.time() - t0:.1f} s", flush=True)
    A_split = unify_absorbers((gsp,))
    fmu = lambda T, P: MU
    fT = lambda P: interp_linear(jnp.log(P), lnPe, Tj)

    def olr_unfused(s, A):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        tau = _column_tau(Pg, G, fTs, fmu, A, 3)
        B = _planck_levels(Pg, A.nu, fTs)
        return outgoing_flux(tau, B, 5)

    def olr_fused(s, gs):
        fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
        return table_olr_fused(gs, Pg, G, fTs, fmu, 3, 5)

    # accuracy first
    spec_u = jax.jit(lambda A: olr_unfused(0.0, A))(A_split)
    spec_f = jax.jit(lambda gs: olr_fused(0.0, gs))(gsp)
    bu = float(trapz(jnp.asarray(nu), spec_u))
    bf = float(trapz(jnp.asarray(nu), spec_f))
    pk = float(jnp.max(spec_u))
    ptw = float(jnp.max(jnp.abs(spec_f - spec_u))) / pk
    print(f"band OLR: unfused {bu:.4f} fused {bf:.4f} W/m^2 "
          f"(rel {abs(bf-bu)/bu:.2e}); pointwise max {ptw:.2e} of peak",
          flush=True)

    x0 = jnp.asarray(0.0)

    def measure(core, arg):
        @jax.jit
        def ch(x, a):
            def body(c, _):
                return c + 1e-30 * core(c, a).sum(), None
            c, _ = lax.scan(body, x, None, length=K)
            return c

        float(np.asarray(ch(x0, arg)))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(np.asarray(ch(x0 + 0.01 * i, arg)))
            times.append(time.perf_counter() - t0)
        rtts = []
        for i in range(5):
            t0 = time.perf_counter()
            float((x0 + 1.0 + i).sum())
            rtts.append(time.perf_counter() - t0)
        return max(min(times) - min(rtts), 1e-9) / K

    dt_u = measure(olr_unfused, A_split)
    print(f"unfused split pipeline: {dt_u*1e3:7.3f} ms/call (K={K})", flush=True)
    dt_f = measure(olr_fused, gsp)
    print(f"fused kernel          : {dt_f*1e3:7.3f} ms/call (K={K}) "
          f"[{dt_u/dt_f:.2f}x]", flush=True)




def block_sweep(n_nu=524288, nlev=20, K=32):
    """A/B the fused kernel's block_n (call with 'sweep' argv)."""
    co2 = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(co2.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, n_nu)
    Pe = pressuregrid(PT, PS, nlev)
    Te = np.maximum(288.0 * (Pe / PS) ** (R_GAS / (MU * CP)), 160.0)
    lnPe, Pg = jnp.log(jnp.asarray(Pe)), jnp.asarray(Pe)
    Tj = jnp.asarray(Te)
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (0.9 * PT, 1.01 * PS), 24)
    gsp = Gas.from_lines(co2, 0.95, nu, dom).split_precision(16)
    fmu = lambda T, P: MU
    x0 = jnp.asarray(0.0)
    for bn in (256, 512, 1024, 2048):
        def core(s, gs, _bn=bn):
            fTs = lambda P: interp_linear(jnp.log(P), lnPe, Tj + 1e-12 * s)
            return table_olr_fused(gs, Pg, G, fTs, fmu, 3, 5, block_n=_bn)

        @jax.jit
        def ch(x, a):
            def body(c, _):
                return c + 1e-30 * core(c, a).sum(), None
            c, _ = lax.scan(body, x, None, length=K)
            return c

        float(np.asarray(ch(x0, gsp)))
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(np.asarray(ch(x0 + 0.01 * i, gsp)))
            times.append(time.perf_counter() - t0)
        rtts = []
        for i in range(5):
            t0 = time.perf_counter()
            float((x0 + 1.0 + i).sum())
            rtts.append(time.perf_counter() - t0)
        dt = max(min(times) - min(rtts), 1e-9) / K
        print(f"block_n {bn:5d}: {dt*1e3:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        block_sweep()
    else:
        main()
