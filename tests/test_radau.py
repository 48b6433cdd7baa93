"""Batched adaptive Radau IIA(5) integrator vs closed forms and scipy.

The on-device adaptive engine (utils/radau.py) mirrors the reference's
ScalarRadau dependency (ref core/radau.jl:90,130,177; atmospherics.jl:87,161,441)
— these tests validate order, stiffness handling, per-lane adaptivity,
direction, and dense output.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from clearsky_tpu.utils.radau import radau_scalar, radau_dense


def test_linear_decay_batched_rates():
    """dy/dx = -k y over widely varying stiffness per lane, one call."""
    k = jnp.asarray([1e-2, 1.0, 10.0, 1e3, 1e6])

    def f(x, y, args):
        return -args * y

    r = radau_scalar(f, jnp.ones(5), 0.0, 2.0, args=k, rtol=1e-8, atol=1e-12)
    assert bool(r.ok.all())
    exact = np.exp(-np.asarray(k) * 2.0)
    np.testing.assert_allclose(np.asarray(r.y), exact, rtol=1e-6, atol=1e-12)


def test_stiff_lane_takes_more_steps():
    """Per-lane adaptivity: the oscillatory-forcing lane must work harder
    than the quiescent one (independent step-size controllers)."""
    w = jnp.asarray([0.1, 200.0])

    def f(x, y, args):
        return jnp.cos(args * x) * args  # y = sin(w x)

    r = radau_scalar(f, jnp.zeros(2), 0.0, 1.0, args=w, rtol=1e-8, atol=1e-10)
    assert bool(r.ok.all())
    np.testing.assert_allclose(
        np.asarray(r.y), np.sin(np.asarray(w)), rtol=1e-5, atol=1e-8
    )
    assert int(r.steps[1]) > 4 * int(r.steps[0])


def test_schwarzschild_form_stiff_relaxation():
    """dy/dx = k (B(x) - y): the Schwarzschild structure — L-stability lets
    huge k (optically thick) relax onto the source function in few steps."""
    k = jnp.asarray([0.1, 1.0, 1e4])

    def f(x, y, args):
        return args * (x - y)

    # exact: y = x - 1/k + (y0 + 1/k) e^{-k x}
    r = radau_scalar(f, jnp.zeros(3), 0.0, 3.0, args=k, rtol=1e-9, atol=1e-12)
    assert bool(r.ok.all())
    kk = np.asarray(k)
    exact = 3.0 - 1.0 / kk + (1.0 / kk) * np.exp(-kk * 3.0)
    np.testing.assert_allclose(np.asarray(r.y), exact, rtol=1e-7)
    # L-stability: the k=1e4 lane must not be forced to resolve the 1/k
    # transient (an explicit method would need ~1e4 steps; scipy's Radau
    # takes 135 on this problem, this implementation 126)
    assert int(r.steps[2]) < 500


def test_nonlinear_vs_closed_form():
    """y' = y^2, y(0)=1 -> y = 1/(1-x); Newton actually iterates here."""

    def f(x, y, args):
        return y * y

    r = radau_scalar(f, jnp.ones(1), 0.0, 0.5, rtol=1e-10, atol=1e-12)
    assert bool(r.ok.all())
    np.testing.assert_allclose(float(r.y[0]), 2.0, rtol=1e-8)


def test_nonlinear_vs_scipy_radau():
    """Nonautonomous nonlinear lane-batch against scipy's Radau."""
    a = np.array([0.5, 2.0, 5.0])

    def f(x, y, args):
        return jnp.sin(x) * y + jnp.cos(args * x)

    r = radau_scalar(f, jnp.ones(3), 0.0, 4.0, args=jnp.asarray(a),
                     rtol=1e-9, atol=1e-12)
    assert bool(r.ok.all())
    for i, ai in enumerate(a):
        sol = solve_ivp(
            lambda t, y: np.sin(t) * y + np.cos(ai * t), (0.0, 4.0), [1.0],
            method="Radau", rtol=1e-10, atol=1e-13,
        )
        np.testing.assert_allclose(float(r.y[i]), sol.y[0, -1], rtol=1e-6)


def test_negative_direction():
    def f(x, y, args):
        return -y

    r = radau_scalar(f, jnp.ones(2), 1.0, 0.0, rtol=1e-9, atol=1e-12)
    assert bool(r.ok.all())
    np.testing.assert_allclose(np.asarray(r.y), np.e, rtol=1e-7)


def test_per_lane_bounds():
    """Lanes with different integration spans finish at their own x1."""
    def f(x, y, args):
        return -y

    x1 = jnp.asarray([0.5, 1.0, 2.0])
    r = radau_scalar(f, jnp.ones(3), 0.0, x1, rtol=1e-9, atol=1e-12)
    assert bool(r.ok.all())
    np.testing.assert_allclose(np.asarray(r.y), np.exp(-np.asarray(x1)), rtol=1e-7)


def test_dense_output_nodes():
    def f(x, y, args):
        return -2.0 * y

    xs = np.linspace(0.0, 3.0, 7)
    ys = radau_dense(f, jnp.asarray([1.0, 4.0]), xs, rtol=1e-9, atol=1e-12)
    assert ys.shape == (7, 2)
    exact = np.exp(-2.0 * xs)[:, None] * np.array([1.0, 4.0])[None, :]
    np.testing.assert_allclose(np.asarray(ys), exact, rtol=1e-6)


def test_zero_span_is_identity():
    def f(x, y, args):
        return -y

    r = radau_scalar(f, jnp.asarray([3.0]), 1.0, 1.0)
    assert bool(r.ok.all())
    np.testing.assert_allclose(float(r.y[0]), 3.0)


def test_newton_iters_guard():
    with pytest.raises(ValueError):
        radau_scalar(lambda x, y, a: -y, jnp.ones(1), 0.0, 1.0, newton_iters=1)


def test_nan_lane_is_inert():
    """A NaN lane (poisoned upstream segment or NaN RHS at x0) must be marked
    done immediately — one bad lane must not pin the whole batch's while_loop
    at max_steps — while finite lanes integrate normally and the NaN
    propagates to the output."""
    k = jnp.asarray([1.0, 1.0])

    def f(x, y, args):
        return -args * y

    y0 = jnp.asarray([1.0, np.nan])
    r = radau_scalar(f, y0, 0.0, 2.0, args=k, rtol=1e-8, atol=1e-12)
    assert np.isnan(np.asarray(r.y)[1])
    assert int(r.steps[1]) == 0  # never attempted
    np.testing.assert_allclose(float(r.y[0]), np.exp(-2.0), rtol=1e-6)
    # dense output: the poison propagates through remaining segments without
    # stalling them
    ys = radau_dense(f, y0, jnp.linspace(0.0, 2.0, 5), args=k, rtol=1e-8)
    assert np.all(np.isnan(np.asarray(ys)[1:, 1]))
    np.testing.assert_allclose(
        np.asarray(ys)[:, 0], np.exp(-np.linspace(0.0, 2.0, 5)), rtol=1e-6
    )


def test_nan_rhs_at_start_poisons_y():
    """A finite y0 whose RHS is NaN at x0 must come back NaN — not be passed
    off as the converged integral (done lanes read as ok)."""
    def f(x, y, args):
        return jnp.where(jnp.asarray(args) > 0, jnp.nan, -y)

    r = radau_scalar(f, jnp.ones(2), 0.0, 2.0, args=jnp.asarray([1.0, -1.0]),
                     rtol=1e-8, atol=1e-12)
    assert np.isnan(np.asarray(r.y)[0])
    np.testing.assert_allclose(float(r.y[1]), np.exp(-2.0), rtol=1e-6)
