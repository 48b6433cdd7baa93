"""Root finding.

Host-side bracketing/secant solvers mirroring the reference's
(ClearSky.jl ``src/util.jl:98-155``) for setup-time work, plus a fixed-iteration
jnp Newton/bisection hybrid for traced (jit/vmap) use such as Kepler's equation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["regula_falsi", "secant", "bisect_jax"]


def _terminate(a, b, tol):
    return abs(a - b) < (tol + tol * abs(b))


def regula_falsi(F, x1, x2, p=None, tol: float = 1e-6):
    """Bracketing false-position root solver (Illinois variant).

    Same contract as the reference's ``regulafalsi`` (ref util.jl:106-132)
    but a faster, stagnation-free iteration: the reference freezes the
    endpoint ordinates (bisection-slow); the naive textbook update instead
    pins one endpoint forever on convex functions and — combined with the
    bracket-midpoint return — can report a point far from the root. The
    Illinois weighting avoids both, and the returned value is the last
    false-position estimate itself.
    """
    if x1 == x2:
        raise ValueError("starting points must not be identical")
    y1 = F(x1, p)
    if y1 == 0:
        return x1
    y2 = F(x2, p)
    if y2 == 0:
        return x2
    if np.sign(y1) == np.sign(y2):
        raise ValueError("regula falsi non-bracketing")
    xm = x1
    side = 0
    for _ in range(10000):
        xm_prev = xm
        xm = x1 - y1 * (x2 - x1) / (y2 - y1)
        ym = F(xm, p)
        if ym == 0 or _terminate(xm_prev, xm, tol):
            return xm
        if np.sign(ym) == np.sign(y1):
            x1, y1 = xm, ym
            if side == 1:
                y2 *= 0.5  # Illinois: damp the stale endpoint
            side = 1
        else:
            x2, y2 = xm, ym
            if side == -1:
                y1 *= 0.5
            side = -1
    return xm


def secant(F, x1, x2, p=None, tol: float = 1e-6):
    """Secant root solver. Ref util.jl:135-155."""
    if x1 == x2:
        raise ValueError("starting points must not be identical")
    y1 = F(x1, p)
    if y1 == 0:
        return x1
    y2 = F(x2, p)
    if y2 == 0:
        return x2
    x3 = 0.0
    n = 0
    while (not (_terminate(x1, x2, tol) and _terminate(y1, y2, tol))) or (n < 2):
        x3 = x1 - y1 * (x2 - x1) / (y2 - y1)
        y3 = F(x3, p)
        x1, x2 = x2, x3
        y1, y2 = y2, y3
        n += 1
        if n > 10000:
            break
    return x3


def bisect_jax(F, x1, x2, n_iter: int = 64):
    """Fixed-iteration bisection, jit/vmap-safe (static trip count for XLA).

    ``F`` maps a (possibly batched) point to residuals; x1/x2 must bracket the
    roots elementwise. 64 iterations reach f64 machine precision on any
    reasonable bracket. This is the traced replacement for the reference's
    adaptive ``regulafalsi`` in compiled code paths (e.g. Kepler's equation,
    ref orbits.jl:63-72).
    """
    x1 = jnp.asarray(x1, dtype=jnp.result_type(float))
    x2 = jnp.asarray(x2, dtype=x1.dtype)
    y1 = F(x1)

    def body(_, carry):
        a, b, ya = carry
        m = 0.5 * (a + b)
        ym = F(m)
        left = ya * ym > 0
        a_new = jnp.where(left, m, a)
        ya_new = jnp.where(left, ym, ya)
        b_new = jnp.where(left, b, m)
        return a_new, b_new, ya_new

    a, b, _ = lax.fori_loop(0, n_iter, body, (x1, x2, y1))
    return 0.5 * (a + b)
