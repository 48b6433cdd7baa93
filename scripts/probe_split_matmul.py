"""Micro A/B: why is the split-precision (f32 lead + bf16 tail) sigma
contraction not faster than the full-f32 one? Times each stage in isolation:
pure HBM reads of the tensors, the matmuls alone, and variants.

Run on TPU: timeout 2400 python scripts/probe_split_matmul.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

N = 524288
NC = 288
K = 16
L = 57


def chain(fn, x0, args, K_chain=64, reps=3):
    @jax.jit
    def ch(x, *a):
        def body(c, _):
            return c + 1e-30 * fn(c, *a), None
        c, _ = lax.scan(body, x, None, length=K_chain)
        return c

    float(np.asarray(ch(x0, *args)))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(ch(x0 + 0.01 * i, *args)))
        times.append(time.perf_counter() - t0)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float((x0 + 1.0 + i).sum())
        rtts.append(time.perf_counter() - t0)
    return max(min(times) - min(rtts), 1e-9) / K_chain


def main():
    rng = np.random.default_rng(0)
    full = jnp.asarray(rng.normal(size=(NC, N)).astype(np.float32))
    lead = full[:K]
    tail = full[K:].astype(jnp.bfloat16)
    basis = jnp.asarray(rng.normal(size=(L, NC)).astype(np.float32))
    bl = basis[:, :K]
    bt = basis[:, K:].astype(jnp.bfloat16)
    x0 = jnp.asarray(0.0)

    H = jax.lax.Precision.HIGH
    HH = jax.lax.Precision.HIGHEST

    cases = {
        "read full f32 (sum)": (lambda c, f: (f * (1 + c)).sum(), (full,)),
        "read tail bf16 (sum)": (lambda c, t: (t.astype(jnp.float32) * (1 + c)).sum(), (tail,)),
        "matmul full HIGH": (
            lambda c, b, f: jnp.matmul(b + c, f, precision=H).sum(), (basis, full)),
        "matmul lead HIGH + tail bf16": (
            lambda c, b1, l, b2, t: (
                jnp.matmul(b1 + c, l, precision=H)
                + jnp.matmul(b2, t, preferred_element_type=jnp.float32)
            ).sum(),
            (bl, lead, bt, tail)),
        "matmul tail bf16 only": (
            lambda c, b2, t: jnp.matmul(
                b2 + jnp.bfloat16(0) * c.astype(jnp.bfloat16), t,
                preferred_element_type=jnp.float32).sum(),
            (bt, tail)),
        "full pipeline exp(full HIGH)": (
            lambda c, b, f: jnp.exp(jnp.matmul(b + c, f, precision=H) * 1e-3).sum(),
            (basis, full)),
        "full pipeline exp(split)": (
            lambda c, b1, l, b2, t: jnp.exp((
                jnp.matmul(b1 + c, l, precision=H)
                + jnp.matmul(b2, t, preferred_element_type=jnp.float32)
            ) * 1e-3).sum(),
            (bl, lead, bt, tail)),
    }
    for name, (fn, args) in cases.items():
        dt = chain(fn, x0, args)
        print(f"{name:32s}: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
