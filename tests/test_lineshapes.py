"""Line-shape kernel tests: Faddeeva accuracy, profiles, TIPS scaling, line-sum."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.special as sp

from clearsky_tpu.ops.faddeeva import wofz_re, wofz_re_im
from clearsky_tpu.ops import lineshape as ls
from clearsky_tpu.ops.linesum import (
    build_line_window_plan,
    sigma_from_lines,
    _line_params,
)
from clearsky_tpu.spectra.lines import SpectralLines
from clearsky_tpu.spectra.molparam import molparam
from clearsky_tpu.constants import TIPS_TMIN, TIPS_TMAX


def test_faddeeva_accuracy_vs_scipy():
    rng = np.random.RandomState(0)
    x = rng.uniform(-50, 50, 50000)
    y = 10 ** rng.uniform(-8, 3, 50000)
    ref = sp.wofz(x + 1j * y).real
    got = np.asarray(wofz_re(x, y))
    rel = np.abs(got - ref) / np.abs(ref)
    # Humlicek w4 accuracy class (~1e-4), same class as Faddeyeva985 upstream
    assert rel.max() < 5e-4
    assert np.median(rel) < 1e-4


def test_faddeeva_imag_part():
    x = np.linspace(-10, 10, 101)
    y = np.full_like(x, 0.5)
    wr, wi = (np.asarray(v) for v in wofz_re_im(x, y))
    ref = sp.wofz(x + 1j * y)
    assert np.allclose(wr, ref.real, rtol=5e-4, atol=1e-12)
    assert np.allclose(wi, ref.imag, rtol=5e-4, atol=1e-12)


def test_faddeeva_no_nan_extremes():
    x = np.array([0.0, 1e4, -1e4, 0.0, 5.4])
    y = np.array([0.0, 0.0, 1e4, 1e4, 1e-30])
    out = np.asarray(wofz_re(x, y))
    assert np.all(np.isfinite(out))


def test_voigt_limits():
    # gamma >> alpha -> Lorentzian; alpha >> gamma -> Doppler
    dnu = np.linspace(-5, 5, 201)
    fl = np.asarray(ls.fvoigt(dnu, 1e-4, 0.5))
    assert np.allclose(fl, np.asarray(ls.florentz(dnu, 0.5)), rtol=1e-3)
    # Doppler limit holds only in the core: in the far tail the Voigt's
    # Lorentzian wings (~ y/(sqrt(pi) x^2)) dominate the Gaussian, however
    # small gamma is — compare within 3 Doppler widths.
    core = np.abs(dnu) <= 1.5
    fd = np.asarray(ls.fvoigt(dnu[core], 0.5, 1e-7))
    assert np.allclose(fd, np.asarray(ls.fdoppler(dnu[core], 0.5)), rtol=1e-3)


def test_profiles_normalize_to_one():
    # integral of each profile over dnu ~ 1
    dnu = np.linspace(-2000, 2000, 2000001)
    for f in [
        lambda d: ls.fdoppler(d, 0.3),
        lambda d: ls.florentz(d, 0.3),
        lambda d: ls.fvoigt(d, 0.2, 0.3),
    ]:
        v = np.asarray(f(dnu))
        assert np.trapezoid(v, dnu) == pytest.approx(1.0, rel=1e-2)


def test_chi_phco2_continuity():
    T = 250.0
    for brk in [3.0, 30.0, 120.0]:
        lo = float(ls.chi_phco2(brk - 1e-9, T))
        hi = float(ls.chi_phco2(brk + 1e-9, T))
        assert lo == pytest.approx(hi, rel=1e-6)
    assert float(ls.chi_phco2(0.5, T)) == 1.0
    # chi(200 cm^-1, 250 K) = exp(-27 B1 - 90 B2 - 0.0232*80) = 2.63e-3
    # (Perrin & Hartmann constants, ref line_shapes.jl:467-481)
    assert float(ls.chi_phco2(200.0, T)) == pytest.approx(2.6294e-3, rel=1e-3)


def test_tips_chebyshev_sane():
    # Qref/Q(296 K) should be ~1 for every isotopologue with a fit
    mp = molparam(2)  # CO2
    qq = np.asarray(ls.cheb_qref_q(296.0, jnp.asarray(mp.cheb)))
    assert np.allclose(qq, 1.0, rtol=0.02)
    # Q grows with T, so Qref/Q decreases
    qq_hot = np.asarray(ls.cheb_qref_q(800.0, jnp.asarray(mp.cheb)))
    assert np.all(qq_hot < qq)


def test_scale_intensity_identity_at_296():
    # at T = Tref the scaling is exactly Qref/Q(296) ~ 1
    s = float(
        ls.scale_intensity(1e-20, 667.0, 100.0, 1.0, 296.0)
    )
    assert s == pytest.approx(1e-20, rel=1e-12)


@pytest.fixture(scope="module")
def co2(fixtures_dir):
    return SpectralLines.from_par(f"{fixtures_dir}/CO2.par")


def test_line_sum_matches_bruteforce(co2):
    nu = np.linspace(620.0, 680.0, 300)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=64)
    T, P, Pp = 260.0, 3e4, 120.0
    got = np.asarray(sigma_from_lines(plan, co2, T, P, Pp, "voigt"))
    S, a, g = (np.asarray(v) for v in _line_params(co2, T, P, Pp))
    nul = np.asarray(co2.nu)
    sqln2 = np.sqrt(np.log(2))
    ref = np.zeros_like(nu)
    for i, v in enumerate(nu):
        m = np.abs(v - nul) <= 25.0
        d = sqln2 / a[m]
        f = (
            (1 / np.sqrt(np.pi / np.log(2)))
            * (1 / a[m])
            * sp.wofz((v - nul[m]) * d + 1j * g[m] * d).real
        )
        ref[i] = np.sum(S[m] * f)
    assert np.allclose(got, ref, rtol=1e-5)


def test_line_sum_batched_consistency(co2):
    nu = np.linspace(640.0, 660.0, 128)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0)
    Ts = jnp.asarray([200.0, 280.0])
    Ps = jnp.asarray([1e3, 1e5])
    batch = np.asarray(sigma_from_lines(plan, co2, Ts, Ps, 0.0 * Ps, "voigt"))
    for k in range(2):
        single = np.asarray(
            sigma_from_lines(plan, co2, Ts[k], Ps[k], 0.0, "voigt")
        )
        assert np.allclose(batch[k], single, rtol=1e-12)


def test_line_sum_all_shapes_run(co2):
    nu = np.linspace(640.0, 660.0, 64)
    for shape, cut in [("voigt", 25.0), ("lorentz", 25.0), ("doppler", 25.0), ("phco2", 500.0)]:
        plan = build_line_window_plan(nu, np.asarray(co2.nu), cut)
        out = np.asarray(sigma_from_lines(plan, co2, 250.0, 1e4, 10.0, shape))
        assert out.shape == (64,)
        assert np.all(np.isfinite(out))
        assert np.all(out >= 0)


def test_phco2_below_voigt_in_far_wings(co2):
    # chi < 1 in far wings: sub-Lorentzian sigma <= Voigt sigma there
    nu = np.linspace(400.0, 500.0, 32)  # far from the 667 band center
    plan_v = build_line_window_plan(nu, np.asarray(co2.nu), 500.0)
    voigt = np.asarray(sigma_from_lines(plan_v, co2, 250.0, 1e5, 0.0, "voigt"))
    sub = np.asarray(sigma_from_lines(plan_v, co2, 250.0, 1e5, 0.0, "phco2"))
    assert np.all(sub <= voigt * (1 + 1e-9))


def test_wofz_jvp_stable_and_correct():
    """The Faddeeva JVP must come from the ODE w' = -2 z w + 2i/sqrt(pi):
    differentiating the w4 rationals squares region 1's denominator
    (~|z|^8), which overflows float32 at the far-wing arguments of narrow
    low-wavenumber lines (|x| = cut/alpha up to ~1e7). Regression: f32
    tangents finite at extreme |x|; f64 tangents match central differences."""
    import jax

    # f32 extreme far wing: primal survives (two-division form), and with
    # the ODE rule the tangent must too
    x32 = jnp.asarray([3e7, -4e6, 1e5], jnp.float32)
    y32 = jnp.asarray([1e-3, 5.0, 0.3], jnp.float32)
    (wr, wi), (dwr, dwi) = jax.jvp(
        wofz_re_im, (x32, y32), (jnp.ones_like(x32), jnp.ones_like(y32))
    )
    assert np.all(np.isfinite(np.asarray(dwr)))
    assert np.all(np.isfinite(np.asarray(dwi)))
    # f64 correctness vs central differences across all four w4 regions.
    # Tolerance is the w4 approximation class (~1e-3 near region edges): the
    # ODE rule is the exact derivative of the TRUE function, while central
    # differences differentiate the approximation.
    x = jnp.asarray([0.3, 2.0, 4.0, 7.0, 20.0, 300.0], jnp.float64)
    y = jnp.asarray([0.2, 0.005, 0.05, 2.0, 8.0, 0.5], jnp.float64)
    for wrt in (0, 1):
        t = (jnp.ones_like(x), jnp.zeros_like(y))[:: 1 if wrt == 0 else -1]
        _, (dwr, dwi) = jax.jvp(wofz_re_im, (x, y), t)
        h = 1e-6
        dx = h if wrt == 0 else 0.0
        dy = h if wrt == 1 else 0.0
        wrp, wip = wofz_re_im(x + dx, y + dy)
        wrm, wim = wofz_re_im(x - dx, y - dy)
        np.testing.assert_allclose(
            np.asarray(dwr), np.asarray((wrp - wrm) / (2 * h)), rtol=7e-3, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(dwi), np.asarray((wip - wim) / (2 * h)), rtol=7e-3, atol=1e-9
        )


def test_wofz_reverse_mode_transposes():
    """jax.grad must work through the Faddeeva custom JVP (the tangent rule
    is linear, so jax transposes it); reverse and forward gradients agree."""
    import jax

    def f(x, y):
        wr, wi = wofz_re_im(x, y)
        return jnp.sum(wr * wr + 0.3 * wi)

    x = jnp.asarray([0.5, 3.0, 12.0, 80.0], jnp.float64)
    y = jnp.asarray([0.2, 0.004, 2.0, 0.6], jnp.float64)
    gx = jax.grad(f, argnums=0)(x, y)
    gy = jax.grad(f, argnums=1)(x, y)
    fx = jax.jacfwd(f, argnums=0)(x, y)
    fy = jax.jacfwd(f, argnums=1)(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(fx), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(fy), rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(gx)))
