"""Design study for split-precision Chebyshev coefficient storage (round 5).

The production table pipeline's dominant HBM byte term is the f32
[nT*nP, n_nu] coefficient read (~604 MB at 2^19). VERDICT r4 #1 asks for
split-precision storage: the few magnitude-carrying coefficients stay f32,
the tail goes bf16 (f32 accumulation). This script measures, on a real CO2
bake, (a) the coefficient magnitude profile over the flattened (T, P) node
index, and (b) the ln-space / sigma-space error of top-K-lead splits against
the full-f64 table, so the production K can be chosen against the table's
own intrinsic fit error (~1.3% max-rel class).

Run on CPU (f64): python scripts/proto_split_precision.py [n_nu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.absorption.domain import AtmosphericDomain
from clearsky_tpu.absorption.gas import bake_sigma_grid, _ln_sigma_coeffs
from clearsky_tpu.utils.interp import cheb_basis

CO2_PAR = "/root/reference/test/HITRAN/CO2.par"


def main(n_nu=8192):
    lines = SpectralLines.from_par(CO2_PAR)
    nu_l = np.asarray(lines.nu)
    nu = np.linspace(max(nu_l.min() - 25.0, 1.0), nu_l.max() + 25.0, n_nu)
    dom = AtmosphericDomain.create((150.0, 350.0), 12, (9.0, 1.01e5), 24)

    t0 = time.time()
    sigma = bake_sigma_grid(lines, 0.95, nu, dom, backend="oracle")
    print(f"bake: {time.time() - t0:.1f} s, sigma {sigma.shape}")
    coeffs = _ln_sigma_coeffs(sigma, dom)  # [288, n_nu] f64
    nc = coeffs.shape[0]

    # (a) magnitude profile over flattened node index k = i*nP + j
    mx = np.abs(coeffs).max(axis=1)
    order = np.argsort(-mx)
    print("\nper-k max|c| (sorted desc), first 40:")
    for r in range(0, 40, 8):
        idx = order[r:r + 8]
        print("  " + "  ".join(f"k={k:3d}({k//24},{k%24}):{mx[k]:8.2f}" for k in idx))
    csum = np.cumsum(mx[order])
    print(f"\nsum|c| total {csum[-1]:.1f}; tail sums at K = "
          + ", ".join(f"{K}:{csum[-1]- csum[K - 1]:.2f}" for K in (8, 16, 32, 48, 64, 96)))

    # dense (T,P) sample
    N = 24
    T = np.linspace(dom.Tmin, dom.Tmax, N)
    P = 10 ** np.linspace(np.log10(dom.Pmin * 1.02), np.log10(dom.Pmax * 0.98), N)
    TT, PP = np.meshgrid(T, P, indexing="ij")
    BT = np.asarray(cheb_basis(jnp.asarray(TT.ravel()), dom.Tmin, dom.Tmax, dom.nT))
    BP = np.asarray(cheb_basis(jnp.log(jnp.asarray(PP.ravel())),
                               np.log(dom.Pmin), np.log(dom.Pmax), dom.nP))
    basis = (BT[:, :, None] * BP[:, None, :]).reshape(len(TT.ravel()), -1)  # [L, 288]

    ln_ref = basis @ coeffs  # [L, n_nu] f64 — the full-precision table surface
    sig_ref = np.exp(ln_ref)
    peak = sig_ref.max()
    mask = sig_ref > 1e-8 * peak  # the production error mask

    import ml_dtypes

    def split_err(K, score):
        lead = np.argsort(-score)[:K]
        sel = np.zeros(nc, bool)
        sel[lead] = True
        c2 = coeffs.copy()
        c2[~sel] = np.asarray(
            coeffs[~sel].astype(ml_dtypes.bfloat16), np.float64
        )
        # basis also rides bf16 on the tail matmul
        b2 = basis.copy()
        b2[:, ~sel] = np.asarray(basis[:, ~sel].astype(ml_dtypes.bfloat16), np.float64)
        ln = basis[:, sel] @ c2[sel] + b2[:, ~sel] @ c2[~sel]
        dln = np.abs(ln - ln_ref)
        rel = np.abs(np.exp(ln) - sig_ref) / np.maximum(sig_ref, 1e-300)
        bytes_per_nu = K * 4 + (nc - K) * 2
        return (dln.max(), np.quantile(dln, 0.99), rel[mask].max(),
                np.quantile(rel[mask], 0.99), bytes_per_nu)

    print("\nsplit error vs f64 table (score = max|c| over nu):")
    print(f"{'K':>4} {'maxdln':>10} {'p99dln':>10} {'maxrel':>10} {'p99rel':>10} {'B/nu':>6} {'vs1152':>7}")
    for K in (0, 8, 16, 24, 32, 48, 64, 96, 128):
        mdl, p99l, mr, p99r, bpn = split_err(K, mx)
        print(f"{K:>4} {mdl:10.2e} {p99l:10.2e} {mr:10.2e} {p99r:10.2e} {bpn:>6} {bpn/1152:7.3f}")

    # alternative score: mean|c|
    mn = np.abs(coeffs).mean(axis=1)
    print("\nsplit error (score = mean|c| over nu):")
    for K in (16, 32, 48):
        mdl, p99l, mr, p99r, bpn = split_err(K, mn)
        print(f"{K:>4} {mdl:10.2e} {p99l:10.2e} {mr:10.2e} {p99r:10.2e} {bpn:>6} {bpn/1152:7.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
