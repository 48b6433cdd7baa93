"""Pallas line-sum kernel vs the float64 jnp oracle (interpret mode on CPU).

The TPU kernel computes in float32 but carries two-float (hi+lo) wavenumber
positions, so its dnu matches float64 to ~1e-7 cm^-1 — the comparison here is
directly against the float64 oracle, with tolerance set by float32 profile
arithmetic (not by position rounding, which the hi/lo split eliminates).
The kernel itself is exercised on hardware by bench.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clearsky_tpu.ops.linesum import build_line_window_plan, sigma_from_lines
from clearsky_tpu.ops.linesum_pallas import sigma_from_lines_pallas
from clearsky_tpu.spectra.lines import SpectralLines


@pytest.fixture(scope="module")
def co2(fixtures_dir):
    return SpectralLines.from_par(f"{fixtures_dir}/CO2.par", maxlines=600)


@pytest.mark.parametrize("shape,cut", [("voigt", 25.0), ("lorentz", 25.0), ("doppler", 25.0)])
@pytest.mark.parametrize("strategy", ["auto", "nosplit"])
def test_pallas_matches_f64_oracle(co2, shape, cut, strategy):
    nu = np.linspace(610.0, 780.0, 512)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), cut, block=128)
    T = jnp.asarray([220.0, 300.0])
    P = jnp.asarray([5e2, 8e4])
    Pp = 0.5 * P
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, Pp, shape))  # float64
    out = np.asarray(
        sigma_from_lines_pallas(
            plan, co2, T, P, Pp, shape, interpret=True, strategy=strategy
        )
    )
    m = np.abs(ref) > 1e-35
    assert out.shape == ref.shape
    # float32 arithmetic throughout the kernel; positions are hi/lo-split so
    # line cores don't see the 1e-4 cm^-1 f32 position rounding
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-3, atol=1e-32)
    assert np.all(np.abs(out[~m]) < 1e-30)


@pytest.mark.parametrize("shape,cut", [("voigt", 25.0), ("phco2", 500.0)])
def test_split_matches_nosplit(co2, shape, cut):
    """The near/far Humlicek split must agree with the single full-w4 sweep.

    The only permitted delta is far-wing elements where the full path takes
    the y < 0.01 small-y repair and the split takes region 1 directly — they
    agree to O(x^-4) <= 2e-5 rel at |x| >= 15 (see _profile_far)."""
    nu = np.linspace(610.0, 780.0, 512)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), cut, block=128)
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([10.0, 9e4])  # low P: small y (repair region); high P: large y
    a = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, 0.5 * P, shape, interpret=True, strategy="grouped"))
    b = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, 0.5 * P, shape, interpret=True, strategy="nosplit"))
    m = np.abs(b) > 1e-35
    np.testing.assert_allclose(a[m], b[m], rtol=1e-4, atol=0.0)
    assert np.all(np.abs(a[~m]) < 1e-30)  # no spurious opacity off-window


def test_pallas_phco2_sublorentzian(co2):
    nu = np.linspace(610.0, 700.0, 256)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 500.0, block=128)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, P, "phco2"))
    out = np.asarray(
        sigma_from_lines_pallas(plan, co2, T, P, P, "phco2", interpret=True)
    )
    m = np.abs(ref) > 1e-35
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-3, atol=1e-32)


def test_hi_lo_positions_beat_plain_f32(co2):
    """The hi/lo split must recover accuracy plain f32 positions cannot.

    Compare line-core cross-sections at low pressure (narrow Lorentz widths,
    most sensitive to position rounding): the kernel (hi/lo) should agree
    with the f64 oracle ~10x better than an oracle fed f32-rounded positions.
    """
    import jax

    nu_l64 = np.asarray(co2.nu)
    # grid points right at line centers: maximum sensitivity
    centers = nu_l64[(nu_l64 > 640) & (nu_l64 < 680)][:64]
    nu = np.unique(np.round(np.sort(centers), 6))
    plan = build_line_window_plan(nu, nu_l64, 25.0, block=64)
    T = jnp.asarray([200.0])
    P = jnp.asarray([30.0])  # low pressure: gamma ~ 2e-5 cm^-1
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, P, "voigt"))
    out = np.asarray(sigma_from_lines_pallas(plan, co2, T, P, P, "voigt", interpret=True))
    # f32-rounded-position oracle (what plain f32 positions would give)
    co2_32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") and x.dtype.kind == "f" else x,
        co2,
    )
    plan32 = build_line_window_plan(
        np.asarray(nu, np.float64), np.asarray(co2_32.nu, np.float64), 25.0, block=64
    )
    rough = np.asarray(sigma_from_lines(plan32, co2_32, T, P, P, "voigt"))
    m = ref > 0
    err_kernel = np.max(np.abs(out[m] - ref[m]) / ref[m])
    err_f32pos = np.max(np.abs(rough[m] - ref[m]) / ref[m])
    assert err_kernel < 5e-3
    assert err_kernel < err_f32pos / 10.0


def test_state_group_scales_with_catalog(co2):
    """Adaptive state batching: small catalogs batch more states per kernel
    call (bounded by the resident-VMEM budget and the unroll cap); large
    catalogs stay at the conservative GROUP (and run catalog-segmented).
    The group solves the per-shape pack model exactly."""
    from clearsky_tpu.ops.linesum import _state_group, GROUP, GROUP_MAX
    from clearsky_tpu.ops.linesum_pallas import (
        _RESIDENT_VMEM_LIMIT, _grouped_lane_cost, _resident_bytes_est,
    )

    assert _state_group(600, 128) == GROUP_MAX        # tiny catalog: cap
    assert _state_group(2_000_000, 128) == GROUP      # huge catalog: floor
    # mid-size: exactly the resident budget (between floor and cap), per the
    # shape's own pack model — split voigt (7 rows, lane-major) batches fewer
    # states than the pre-transposed 3-row shapes
    for shape in ("voigt", "phco2"):
        n_lines = 10_000
        g = _state_group(n_lines, 256, shape)
        assert GROUP < g < GROUP_MAX, (shape, g)
        strat = "auto"
        assert _resident_bytes_est(
            n_lines, 256, _grouped_lane_cost(shape, strat, g)
        ) <= _RESIDENT_VMEM_LIMIT
        assert _resident_bytes_est(
            n_lines, 256, _grouped_lane_cost(shape, strat, g + 1)
        ) > _RESIDENT_VMEM_LIMIT
    assert _state_group(10_000, 256, "phco2") > _state_group(10_000, 256, "voigt")


@pytest.mark.parametrize("shape,cut,limit", [
    ("voigt", 25.0, 32 * 1024),    # lane-major split pack, 5 segments
    ("phco2", 500.0, 256 * 1024),  # pre-transposed pack, wide windows
])
def test_segmented_matches_resident(co2, shape, cut, limit):
    """Catalog segmentation (large-catalog path) must reproduce the
    single-call resident kernel: each (block, line) window pair lands in
    exactly one segment, so only the summation order and the per-segment
    near/far boundary (d_near = 15*max(alpha) over the segment) differ."""
    from clearsky_tpu.ops.linesum_pallas import (
        _grouped_lane_cost, _resident_bytes_est, _segment_cap, CHUNK,
    )

    nu = np.linspace(610.0, 780.0, 512)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), cut, block=128)
    T = jnp.asarray([220.0, 300.0])
    P = jnp.asarray([5e2, 8e4])
    # the forced budget must actually trigger segmentation for this fixture
    lane_cost = _grouped_lane_cost(shape, "auto", 2)
    assert _resident_bytes_est(co2.nu.shape[0], plan.slab, lane_cost) > limit
    assert _segment_cap(shape, "auto", 2, limit, plan.slab) >= CHUNK
    res = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, 0.5 * P, shape, interpret=True))
    seg = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, 0.5 * P, shape, interpret=True, resident_limit=limit))
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, 0.5 * P, shape))
    m = np.abs(ref) > 1e-35
    np.testing.assert_allclose(seg[m], res[m], rtol=1e-4, atol=0.0)
    np.testing.assert_allclose(seg[m], ref[m], rtol=2e-3, atol=1e-32)
    assert np.all(np.abs(seg[~m]) < 1e-30)  # no cross-segment bleed


def test_pallas_wide_state_batch_matches_oracle(co2):
    """A state batch at the unroll cap (the adaptive group size for small
    catalogs) through the grouped kernel matches the f64 oracle."""
    from clearsky_tpu.ops.linesum import GROUP_MAX

    nu = np.linspace(610.0, 780.0, 256)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=128)
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.uniform(180.0, 320.0, GROUP_MAX))
    P = jnp.asarray(10.0 ** rng.uniform(2.0, 5.0, GROUP_MAX))
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, 0.5 * P, "voigt"))
    out = np.asarray(
        sigma_from_lines_pallas(plan, co2, T, P, 0.5 * P, "voigt", interpret=True)
    )
    m = np.abs(ref) > 1e-35
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-3, atol=1e-32)
    assert np.all(np.abs(out[~m]) < 1e-30)


def test_lane_strategy_matches_oracle(co2):
    """The lane-major resident variant (strategy='lane', kept for A/B) must
    stay correct as the grouped kernel evolves."""
    nu = np.linspace(610.0, 780.0, 512)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=128)
    T = jnp.asarray([220.0, 300.0])
    P = jnp.asarray([5e2, 8e4])
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, 0.5 * P, "voigt"))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, 0.5 * P, "voigt", interpret=True, strategy="lane"))
    m = np.abs(ref) > 1e-35
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-3, atol=1e-32)
    assert np.all(np.abs(out[~m]) < 1e-30)


@pytest.fixture(scope="module")
def co2_full(fixtures_dir):
    return SpectralLines.from_par(f"{fixtures_dir}/CO2.par")


@pytest.mark.parametrize("shape,cut,bar", [("voigt", 25.0, 2e-3),
                                           ("phco2", 500.0, 2e-3)])
def test_coarse_far_strategy_matches_oracle(co2_full, shape, cut, bar):
    """The coarse-grid far-field split (strategy='coarse') on a dense
    sub-band grid: dense profile work drops to ~15% of the one-pass kernel
    (fine zone + coarse far field + thin exact annulus at the hard cut), and
    the result must stay inside the documented accuracy class — measured
    6.6e-4 (voigt) / 5.8e-4 (phco2) rel for sigma >= 1e-4 peak, of-peak
    <= 2.6e-6 (see linesum_pallas.Q_COARSE calibration notes)."""
    from clearsky_tpu.ops.linesum_pallas import _coarse_far_params

    nu = np.linspace(2300.0, 2350.0, 16384)
    plan = build_line_window_plan(nu, np.asarray(co2_full.nu), cut, block=128)
    assert _coarse_far_params(plan) is not None  # the split actually engages
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([1e3, 1e5])
    ref = np.asarray(sigma_from_lines(plan, co2_full, T, P, 0.5 * P, shape))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, 0.5 * P, shape, interpret=True,
        strategy="coarse"))
    pk = np.abs(ref).max(axis=1, keepdims=True)
    m = np.abs(ref) > 1e-4 * pk
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel[m].max() < bar, rel[m].max()
    assert (np.abs(out - ref) / pk).max() < 1e-5
    # deep micro-windows: interpolating the far field's dynamic range costs
    # accuracy where sigma is orders below band-relevant levels (documented)
    m6 = np.abs(ref) > 1e-6 * pk
    assert rel[m6].max() < 5e-2, rel[m6].max()
    # flux-level gate: transmittance through a column with peak tau 1e4
    # (the regime where sigma errors matter most) — pointwise and
    # band-integrated (the f64 calibration measured 1.5e-3 / 6e-7)
    N_col = 1e4 / pk
    dtr = np.exp(-N_col * out) - np.exp(-N_col * ref)
    assert np.abs(dtr).max() < 5e-3, np.abs(dtr).max()
    assert np.abs(dtr.mean(axis=1)).max() < 1e-5


def test_coarse_strategy_falls_back_when_rejected(co2):
    """strategy='coarse' on a geometry the sizing rejects (coarse sparse
    grid) must produce EXACTLY the default grouped kernel's output."""
    from clearsky_tpu.ops.linesum_pallas import _coarse_far_params

    nu = np.linspace(610.0, 780.0, 512)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=128)
    assert _coarse_far_params(plan) is None
    T = jnp.asarray([220.0, 300.0])
    P = jnp.asarray([5e2, 8e4])
    a = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, 0.5 * P, "voigt", interpret=True))
    b = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, 0.5 * P, "voigt", interpret=True, strategy="coarse"))
    np.testing.assert_array_equal(a, b)


def test_coarse_far_nonuniform_grid(co2_full):
    """A non-uniform dense grid routes through the gather interpolation path
    (c_ratio=0) and must meet the same accuracy class."""
    from clearsky_tpu.ops.linesum_pallas import _coarse_far_params

    rng = np.random.default_rng(3)
    nu = np.linspace(2300.0, 2350.0, 16384)
    # random-WALK spacing drift: bounded per-interval jitter but cumulative
    # lattice deviation of many coarse cells, the class the round-5
    # uniformity criterion must reject (point-local jitter without drift is
    # legitimately near-lattice and takes the strided path instead)
    nu = nu + np.cumsum(rng.uniform(-0.2, 0.2, nu.shape)) * (nu[1] - nu[0])
    nu.sort()
    plan = build_line_window_plan(nu, np.asarray(co2_full.nu), 25.0, block=128)
    params = _coarse_far_params(plan)
    assert params is not None and params[3] == 0  # gather path engaged
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([1e3, 1e5])
    ref = np.asarray(sigma_from_lines(plan, co2_full, T, P, 0.5 * P, "voigt"))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, 0.5 * P, "voigt", interpret=True,
        strategy="coarse"))
    pk = np.abs(ref).max(axis=1, keepdims=True)
    m = np.abs(ref) > 1e-4 * pk
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel[m].max() < 2e-3, rel[m].max()


def test_coarse_far_sharded_matches_oracle(co2_full):
    """The nu-sharded device-plan path with prebuilt coarse-far grids: each
    shard's slab (halo widened by 2h for the boundary coarse stencil) through
    the shared traced core must reproduce the unsharded oracle within the
    strategy's accuracy class — and exactly cover the grid when
    concatenated."""
    from clearsky_tpu.absorption.gas import DirectGas
    from clearsky_tpu.absorption.sharded import (
        shard_line_gas, _slice_plan, _slice_lines,
    )
    from clearsky_tpu.ops.linesum_pallas import sigma_from_lines_pallas_device

    nu = np.linspace(2300.0, 2350.0, 16384)
    gas = DirectGas.from_lines(co2_full, 0.9, nu)
    sg = shard_line_gas(gas, 4)
    assert sg.plans.coarse_meta is not None
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([1e3, 1e5])
    parts = []
    for s in range(4):
        parts.append(np.asarray(sigma_from_lines_pallas_device(
            _slice_plan(sg.plans, s), _slice_lines(sg.lines, s),
            T, P, 0.5 * P, "voigt", interpret=True, strategy="coarse")))
    out = np.concatenate(parts, axis=-1)
    plan = build_line_window_plan(nu, np.asarray(co2_full.nu), 25.0, block=128)
    ref = np.asarray(sigma_from_lines(plan, co2_full, T, P, 0.5 * P, "voigt"))
    pk = np.abs(ref).max(axis=1, keepdims=True)
    m = np.abs(ref) > 1e-4 * pk
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel[m].max() < 2e-3, rel[m].max()
    assert (np.abs(out - ref) / pk).max() < 1e-5


def test_coarse_far_multigas_conc(co2_full, fixtures_dir):
    """Fused multi-molecule catalogs (per-line concentrations) through the
    coarse split: the conc scaling must flow through both passes."""
    from clearsky_tpu.spectra.merge import merge_lines
    from clearsky_tpu.ops.linesum_pallas import _coarse_far_params

    h2o = SpectralLines.from_par(f"{fixtures_dir}/H2O.par", maxlines=800)
    merged, conc = merge_lines([(co2_full, 0.9), (h2o, 0.005)])
    nu = np.linspace(2300.0, 2350.0, 16384)
    plan = build_line_window_plan(nu, np.asarray(merged.nu), 25.0, block=128)
    assert _coarse_far_params(plan) is not None
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([1e3, 1e5])
    ref = np.asarray(sigma_from_lines(
        plan, merged, T, P, None, "voigt", conc=jnp.asarray(conc)))
    out = np.asarray(sigma_from_lines_pallas(
        plan, merged, T, P, P, "voigt", interpret=True, strategy="coarse",
        conc=jnp.asarray(conc)))
    pk = np.abs(ref).max(axis=1, keepdims=True)
    m = np.abs(ref) > 1e-4 * pk
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel[m].max() < 2e-3, rel[m].max()


def test_phco2_auto_routes_through_coarse(co2_full):
    """On an accepting geometry, plain strategy='auto' phco2 must produce
    EXACTLY the coarse path's output (the auto-routing contract)."""
    nu = np.linspace(2300.0, 2350.0, 16384)
    plan = build_line_window_plan(nu, np.asarray(co2_full.nu), 500.0, block=128)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    a = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, P, "phco2", interpret=True))
    b = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, P, "phco2", interpret=True, strategy="coarse"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape,cut", [
    ("voigt", 25.0), ("voigt_ref", 25.0), ("phco2", 500.0),
])
def test_stencil_strategy_matches_oracle(co2, shape, cut):
    """strategy='stencil' (region-1 whole-window kernel + XLA near-core
    correction, see _stencil_near_correction) must hold the same accuracy
    bar as the default near/far split against the f64 oracle."""
    nu = np.linspace(610.0, 780.0, 1024)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), cut, block=128)
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([10.0, 9e4])  # low P: tiny y (Doppler core); high P: large y
    Pp = 0.5 * P
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, Pp, shape))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, Pp, shape, interpret=True, strategy="stencil"))
    dflt = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, Pp, shape, interpret=True, strategy="auto"))
    pk = np.abs(ref).max(axis=1, keepdims=True)
    # absolute-of-peak bar at the default split's own level
    bar = max(2.0 * (np.abs(dflt - ref) / pk).max(), 1e-6)
    assert (np.abs(out - ref) / pk).max() < bar
    # relative bar at significant sigma (line cores — where the stencil acts)
    m = np.abs(ref) > 1e-2 * pk
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-3, atol=0.0)
    # no spurious opacity off-window
    m0 = np.abs(ref) > 1e-35
    assert np.all(np.abs(out[~m0]) < 1e-30)


def test_stencil_width_covers_near_zone(co2):
    """_stencil_width's static K must cover |x| <= 15 at any in-domain T:
    K/2 grid steps must reach 15*alpha(T=1000K) for every line within the
    plan's reach (lines beyond the cut never contribute)."""
    from clearsky_tpu.ops.linesum_pallas import _stencil_width, _SQRT_LN2
    from clearsky_tpu.ops.lineshape import alpha_doppler
    nu = np.linspace(610.0, 780.0, 2048)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=128)
    K = _stencil_width(plan, co2)
    nu_l = np.asarray(co2.nu)
    m = (nu_l >= nu[0] - 25.0) & (nu_l <= nu[-1] + 25.0)
    amax = float(np.asarray(alpha_doppler(
        jnp.asarray(nu_l[m]), jnp.asarray(np.asarray(co2.mu)[m]), 1000.0
    )).max())
    dmax = float(np.diff(nu).max())
    assert (K // 2) * dmax >= 15.0 * amax / _SQRT_LN2
    # traced lines (inside an outer jit): the fallback bound must be at
    # least as wide
    import jax

    def probe(l):
        return _stencil_width(plan, l)

    K_traced = []
    jax.make_jaxpr(lambda n, m: K_traced.append(
        _stencil_width(plan, type("L", (), {"nu": n, "mu": m})())
    ) or n)(jnp.asarray(co2.nu), jnp.asarray(co2.mu))
    assert K_traced[0] >= K


def test_stencil_edge_line_clamped(co2):
    """Lines whose stencil would run off the grid edge keep full accuracy
    (the base index clamps into range; coverage comes from the clip)."""
    nu_l = np.asarray(co2.nu)
    # grid starting ON a line so the first lines sit at the left edge
    nu = np.linspace(nu_l[0], nu_l[0] + 80.0, 512)
    plan = build_line_window_plan(nu, nu_l, 25.0, block=128)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, P, "voigt"))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, P, "voigt", interpret=True, strategy="stencil"))
    pk = np.abs(ref).max()
    m = np.abs(ref) > 1e-2 * pk
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-3, atol=0.0)


def test_stencil_non_split_shape_falls_back(co2):
    """strategy='stencil' on a non-Voigt-family shape silently routes to
    the standard kernel (no farall mode exists for single-sweep shapes)."""
    nu = np.linspace(610.0, 700.0, 256)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=128)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    a = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, P, "lorentz", interpret=True, strategy="stencil"))
    b = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, P, "lorentz", interpret=True, strategy="auto"))
    np.testing.assert_array_equal(a, b)


def test_stencil_oversize_catalog_falls_back_to_segmented(co2):
    """A catalog too large for VMEM under strategy='stencil' must take the
    segmented path (which keeps the in-kernel split) and stay correct."""
    nu = np.linspace(610.0, 780.0, 512)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=128)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, P, "voigt"))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, P, "voigt", interpret=True, strategy="stencil",
        resident_limit=64 * 1024))
    m = np.abs(ref) > 1e-35
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-3, atol=1e-32)


def test_voigt_auto_routes_through_stencil(co2):
    """On an accepting geometry, plain strategy='auto' voigt must produce
    EXACTLY the stencil path's output (the auto-routing contract), and the
    in-kernel split must remain reachable via strategy='grouped'."""
    nu = np.linspace(610.0, 780.0, 1024)
    plan = build_line_window_plan(nu, np.asarray(co2.nu), 25.0, block=128)
    T = jnp.asarray([250.0])
    P = jnp.asarray([1e4])
    a = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, P, "voigt", interpret=True))
    b = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, P, "voigt", interpret=True, strategy="stencil"))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(sigma_from_lines_pallas(
        plan, co2, T, P, P, "voigt", interpret=True, strategy="grouped"))
    assert not np.array_equal(a, c)  # a genuinely different compute path
    ref = np.asarray(sigma_from_lines(plan, co2, T, P, P, "voigt"))
    pk = np.abs(ref).max()
    m = np.abs(ref) > 1e-4 * pk
    np.testing.assert_allclose(a[m], ref[m], rtol=2e-3, atol=0.0)


def test_coarse_fine_pass_stencil(co2_full):
    """On a geometry both the coarse split and the stencil accept, the
    coarse fine pass auto-routes its near sweep through the stencil
    correction (weight 1-W). Gate: agreement with the f64 oracle at the
    coarse path's own accuracy class, and with the in-kernel fine pass."""
    from clearsky_tpu.ops import linesum_pallas as LP

    nu_l = np.asarray(co2_full.nu)
    nu = np.arange(600.0, 2500.0, 0.11)  # bench-like spacing
    plan = build_line_window_plan(nu, nu_l, 500.0, block=128)
    assert LP._coarse_far_params(plan) is not None
    geom = LP._stencil_geom_cached(plan, co2_full)
    assert geom is not None  # stencil accepts -> fine pass auto-routes
    T = jnp.asarray([220.0, 300.0])
    P = jnp.asarray([10.0, 9e4])
    ref = np.asarray(sigma_from_lines(plan, co2_full, T, P, 0.5 * P, "phco2"))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, 0.5 * P, "phco2", interpret=True,
        strategy="coarse"))
    pk = np.abs(ref).max(axis=1, keepdims=True)
    m = np.abs(ref) > 1e-4 * pk
    rel = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[m].max()
    assert rel < 2e-3, rel
    # vs the in-kernel fine pass (stencil geometry suppressed)
    old = LP._coarse_core(
        "phco2", True, 8, float(plan.cut), plan.n_nu,
        LP._coarse_far_params(plan), co2_full, T, P, 0.5 * P, None,
        *_coarse_blocks(plan), stencil_geom=None,
    )
    relo = (np.abs(out - np.asarray(old)) / np.maximum(np.abs(ref), 1e-300))[m].max()
    assert relo < 2e-4, relo


def _coarse_blocks(plan):
    """Rebuild the coarse wrapper's block grids (test helper mirroring
    _pallas_sigma_coarse's host-side setup)."""
    from clearsky_tpu.ops import linesum_pallas as LP

    d_far, h, n_cc, c_ratio = LP._coarse_far_params(plan)
    nu_f = np.asarray(plan.nu, np.float64)
    B = plan.block
    Bf = LP._fine_block("phco2", plan.n_nu, B)
    n_blocks_f = -(-plan.n_nu // Bf)
    pad_f = np.full(n_blocks_f * Bf - plan.n_nu, nu_f[-1])
    fnb64 = np.concatenate([nu_f, pad_f]).reshape(n_blocks_f, Bf)
    nu_c0 = nu_f[0] - 2.0 * h
    n_blocks_c = -(-n_cc // B)
    pad_c = np.full(n_blocks_c * B - n_cc, nu_c0 + (n_cc - 1) * h)
    cnb64 = np.concatenate(
        [nu_c0 + np.arange(n_cc) * h, pad_c]).reshape(n_blocks_c, B)

    def blocks_f32(nb64):
        nb_hi = nb64.astype(np.float32)
        nb_lo = (nb64 - nb_hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(nb_hi)[:, None, :], jnp.asarray(nb_lo)[:, None, :]

    return (*blocks_f32(fnb64), *blocks_f32(cnb64))


def test_voigt_auto_routes_through_coarse_on_dense_grid(co2_full):
    """Round-5 auto-routing contract (VERDICT r4 #2): on line-resolving
    dense grids — where the split's work fractions predict a real win over
    the stencil incumbent (sum <= 0.2; hardware-measured: 5x at 2^18 dense,
    2.3x LOSS at the 0.05 cm^-1 production class, so THAT class stays on
    stencil) — plain strategy='auto' voigt routes through the coarse-far
    split, and the accuracy is gated at the level the physics needs:
    band-integrated transmittance error ~1e-6 of unity."""
    from clearsky_tpu.ops.linesum_pallas import _coarse_far_params

    nu = np.linspace(2200.0, 2400.0, 65536)
    plan = build_line_window_plan(nu, np.asarray(co2_full.nu), 25.0, block=128)
    p = _coarse_far_params(plan, frac_limit=0.2)
    assert p is not None
    T = jnp.asarray([200.0, 300.0])
    P = jnp.asarray([1e3, 1e5])
    ref = np.asarray(sigma_from_lines(plan, co2_full, T, P, 0.5 * P, "voigt"))
    auto = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, 0.5 * P, "voigt", interpret=True))
    coarse = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, 0.5 * P, "voigt", interpret=True,
        strategy="coarse"))
    np.testing.assert_array_equal(auto, coarse)  # the routing contract
    pk = np.abs(ref).max(axis=1, keepdims=True)
    rel = np.abs(auto - ref) / np.maximum(np.abs(ref), 1e-300)
    m = np.abs(ref) > 1e-3 * pk
    assert rel[m].max() < 2e-3, rel[m].max()
    assert (np.abs(auto - ref) / pk).max() < 1e-5
    # the band-level flux gate that makes the routing production-legal:
    # transmittance through a peak-tau-1e4 column, pointwise and banded
    N_col = 1e4 / pk
    dtr = np.exp(-N_col * auto) - np.exp(-N_col * ref)
    assert np.abs(dtr).max() < 5e-3, np.abs(dtr).max()
    assert np.abs(dtr.mean(axis=1)).max() < 1e-5, np.abs(dtr.mean(axis=1)).max()


def test_coarse_strided_on_f32_quantized_grid(co2_full):
    """x64-off pipelines build f32 grids whose f64 upcast has ulp-level
    spacing jitter; the round-5 uniformity tolerance (5% of dbar) must keep
    them on the fast strided-interpolation path (c_ratio >= 2) at unchanged
    accuracy (the jitter perturbs only the coarse-node placement, a
    ~1e-3-relative effect on the d_far-smooth far field)."""
    from clearsky_tpu.ops.linesum_pallas import _coarse_far_params

    nu = np.linspace(2200.0, 2400.0, 4096).astype(np.float32).astype(np.float64)
    assert np.abs(np.diff(nu) - np.diff(nu).mean()).max() > 1e-6  # jittery
    plan = build_line_window_plan(nu, np.asarray(co2_full.nu), 25.0, block=128)
    p = _coarse_far_params(plan)
    assert p is not None and p[3] >= 2, p  # strided path engaged
    T = jnp.asarray([220.0, 290.0])
    P = jnp.asarray([1e3, 1e5])
    ref = np.asarray(sigma_from_lines(plan, co2_full, T, P, 0.5 * P, "voigt"))
    out = np.asarray(sigma_from_lines_pallas(
        plan, co2_full, T, P, 0.5 * P, "voigt", interpret=True,
        strategy="coarse"))
    pk = np.abs(ref).max(axis=1, keepdims=True)
    m = np.abs(ref) > 1e-3 * pk
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel[m].max() < 2e-3, rel[m].max()
    N_col = 1e4 / pk
    dtr = np.exp(-N_col * out) - np.exp(-N_col * ref)
    assert np.abs(dtr.mean(axis=1)).max() < 1e-5


def test_coarse_chirped_grid_rejects_strided_path(co2_full):
    """Round-5 review regression: a two-segment grid whose per-interval
    jitter is small but whose CUMULATIVE lattice deviation spans many
    coarse cells must NOT take the strided interpolation path (it silently
    produced 1.8e-2-class sigma errors); it falls to the exact gather
    stencil and stays inside the documented accuracy class."""
    from clearsky_tpu.ops.linesum_pallas import _coarse_far_params

    a = np.linspace(2300.0, 2325.0, 8192, endpoint=False)
    b = np.linspace(2325.0, 2351.0, 8192)  # ~4% larger spacing
    nu = np.concatenate([a, b])
    plan = build_line_window_plan(nu, np.asarray(co2_full.nu), 25.0, block=128)
    p = _coarse_far_params(plan)
    if p is not None:
        assert p[3] < 2, "chirped grid must not be treated as uniform"
        T = jnp.asarray([220.0, 290.0])
        P = jnp.asarray([1e3, 1e5])
        ref = np.asarray(sigma_from_lines(plan, co2_full, T, P, 0.5 * P, "voigt"))
        out = np.asarray(sigma_from_lines_pallas(
            plan, co2_full, T, P, 0.5 * P, "voigt", interpret=True,
            strategy="coarse"))
        pk = np.abs(ref).max(axis=1, keepdims=True)
        m = np.abs(ref) > 1e-3 * pk
        rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300)
        assert rel[m].max() < 2e-3, rel[m].max()
