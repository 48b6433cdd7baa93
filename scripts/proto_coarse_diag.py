"""Diagnose the coarse-far prototype's ~2e-2 rel-error floor: decompose the
error into (a) far-field interpolation and (b) region1-vs-wofz profile parts,
and locate the worst point."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from proto_coarse_far import (switch, voigt_exact, region1, sum_profile,
                              interp_uniform, CO2, CUT, N_NU, SQRT_PI)
from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.ops.linesum import _line_params

lines = SpectralLines.from_par(CO2)
nu_l = np.asarray(lines.nu, np.float64)
nu = np.linspace(nu_l.min() - CUT, nu_l.max() + CUT, N_NU)
NS = 4
T = np.linspace(180.0, 320.0, NS)
P = np.exp(np.linspace(np.log(10.0), np.log(1e5), NS))
S, alpha, gamma = (np.asarray(v, np.float64)
                   for v in _line_params(lines, T, P, P))
ia = 1.0 / alpha
y = gamma * ia
d_near = 15.0 * alpha.max()

d_far, kram, order, q, ipts = 2.0, 2, 2, 8, 6
D1, D2 = d_far**2, (kram * d_far) ** 2
h = d_far / q
w_roll = 4 * h
R1, R2 = (CUT - w_roll) ** 2, CUT**2
W = lambda D: switch(D, D1, D2, order)
Wout = lambda D: 1.0 - switch(D, R1, R2, order)

t0 = time.time()
exact = sum_profile(nu, nu_l, S, ia, y, CUT, prof=voigt_exact)
fine_near = sum_profile(nu, nu_l, S, ia, y, d_near, prof=voigt_exact)
fine_mid = sum_profile(nu, nu_l, S, ia, y, kram * d_far,
                       weight_fn=lambda D: (1.0 - W(D)) * (D > d_near**2),
                       prof=region1)
fine_ann = sum_profile(nu, nu_l, S, ia, y, CUT,
                       weight_fn=lambda D: (1.0 - Wout(D)) * (D > R1),
                       prof=region1)
# exact far field ON THE FINE GRID (no interpolation)
far_exact_r1 = sum_profile(nu, nu_l, S, ia, y, CUT,
                           weight_fn=lambda D: W(D) * Wout(D), prof=region1)
nu_c0 = nu[0] - 2 * h
n_cc = int(np.ceil((nu[-1] + 2 * h - nu_c0) / h)) + 4
nu_c = nu_c0 + np.arange(n_cc) * h
far_c = sum_profile(nu_c, nu_l, S, ia, y, CUT,
                    weight_fn=lambda D: W(D) * Wout(D), prof=region1)
far_f = interp_uniform(nu_c0, h, far_c, nu, npts=ipts)
print(f"sums done {time.time()-t0:.0f}s", flush=True)

pk = np.abs(exact).max(axis=1, keepdims=True)
sig_nointerp = fine_near + fine_mid + fine_ann + far_exact_r1
sig = fine_near + fine_mid + fine_ann + far_f

for name, s in (("no-interp (profile err only)", sig_nointerp),
                ("full scheme", sig)):
    err = np.abs(s - exact)
    rel = err / np.maximum(np.abs(exact), 1e-300)
    m = np.abs(exact) > 1e-8 * pk
    i = np.unravel_index(np.argmax(np.where(m, rel, 0)), rel.shape)
    print(f"{name}: max rel {rel[m].max():.3e} at state {i[0]} "
          f"nu={nu[i[1]]:.3f}, sigma={exact[i]:.3e} ({exact[i]/pk[i[0],0]:.1e} of pk)")
    # nearest line distance at the worst point
    dl = np.abs(nu[i[1]] - nu_l)
    j = np.argmin(dl)
    print(f"   nearest line at d={dl[j]:.4f}, S={S[i[0],j]:.2e}; "
          f"5 nearest d: {np.sort(dl)[:5]}")
    # interp-only error
interr = np.abs(far_f - far_exact_r1)
relint = interr / np.maximum(np.abs(exact), 1e-300)
m = np.abs(exact) > 1e-8 * pk
print("interp-only max rel:", relint[m].max())

# --- log-space interpolation variant -------------------------------------
print("\nlog-space interpolation:", flush=True)
for ipts_l in (4, 6):
    flo = 1e-30 * np.abs(far_c).max(axis=1, keepdims=True)
    lf = np.log(np.maximum(far_c, 0.0) + flo)
    far_log = np.exp(interp_uniform(nu_c0, h, lf, nu, npts=ipts_l)) - flo
    sig_l = fine_near + fine_mid + fine_ann + far_log
    err = np.abs(sig_l - exact)
    rel = err / np.maximum(np.abs(exact), 1e-300)
    for thr in (1e-6, 1e-8):
        m = np.abs(exact) > thr * pk
        i = np.unravel_index(np.argmax(np.where(m, rel, 0)), rel.shape)
        print(f"  ipts={ipts_l} thr={thr:.0e}: max rel {rel[m].max():.3e} "
              f"at nu={nu[i[1]]:.2f} sigma={exact[i]/pk[i[0],0]:.1e} of pk")

# --- root-space interpolation variants ------------------------------------
print("\nroot-space interpolation:", flush=True)
for r in (2.0, 4.0, 8.0):
    for ipts_l in (4, 6):
        G = np.maximum(far_c, 0.0) ** (1.0 / r)
        far_r = interp_uniform(nu_c0, h, G, nu, npts=ipts_l)
        far_r = np.maximum(far_r, 0.0) ** r
        sig_l = fine_near + fine_mid + fine_ann + far_r
        err = np.abs(sig_l - exact)
        rel = err / np.maximum(np.abs(exact), 1e-300)
        out = []
        for thr in (1e-4, 1e-6, 1e-8):
            m = np.abs(exact) > thr * pk
            out.append(f"thr{thr:.0e}: {rel[m].max():.2e}")
        print(f"  root={r:.0f} ipts={ipts_l}: " + "  ".join(out))
