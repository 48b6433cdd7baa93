"""Oracle gates for the fused Pallas flux-march kernel (rt.march_pallas).

The XLA lax.scan implementation in rt.discretized is the correctness oracle
(itself validated against the analytic gray atmosphere and the adaptive ODE
reference); the kernel must reproduce it to reduction-order roundoff across
benign and adversarial optical depths, with and without the stellar beam,
and its custom JVP must agree with the scan JVP.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clearsky_tpu.rt import discretized as disc
from clearsky_tpu.rt.march_pallas import monoflux_pallas
from clearsky_tpu.utils.quadrature import stream_nodes


def _column(L=19, N=1536, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    # adversarial tau mix: transparent (0, 1e-9), series-branch (1e-4),
    # ordinary, and opaque (1e4) layers
    tau = rng.exponential(0.5, (L, N))
    tau[0] = 0.0
    tau[1] = 1e-9
    tau[2] = 1e-4
    tau[-1, : N // 3] = 1e4
    B = 0.5 + rng.random((L + 1, N))
    S = rng.random(N)
    a = rng.random(N) * 0.5
    return (jnp.asarray(tau, dtype), jnp.asarray(B, dtype),
            jnp.asarray(S, dtype), jnp.asarray(a, dtype))


@pytest.mark.parametrize("nstream", [1, 4, 5, 8])
def test_kernel_matches_scan_oracle(nstream):
    tau, B, S, a = _column()
    ct = jnp.cos(jnp.asarray(0.841, tau.dtype))
    m, W = stream_nodes(nstream)
    up_k, dn_k = monoflux_pallas(tau, B, S, a, ct, m, W, interpret=True)
    up_o, dn_o = disc._monoflux_scan(tau, B, S, a, ct, nstream)
    np.testing.assert_allclose(np.asarray(up_k), np.asarray(up_o),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(dn_k), np.asarray(dn_o),
                               rtol=1e-12, atol=1e-14)


def test_kernel_thermal_only_matches_outgoing():
    tau, B, S, a = _column(L=7, N=512, seed=1)
    m, W = stream_nodes(5)
    up_k, dn_k = monoflux_pallas(tau, B, 0 * S, 0 * a,
                                 jnp.asarray(1.0, tau.dtype), m, W,
                                 thermal_only=True, interpret=True)
    olr = disc.outgoing_flux(tau, B, 5)
    np.testing.assert_allclose(np.asarray(up_k[0]), np.asarray(olr),
                               rtol=1e-12, atol=1e-14)
    assert np.all(np.asarray(dn_k) == 0.0)


def test_kernel_pads_non_multiple_blocks():
    # n_nu not a multiple of BLOCK_N: padded lanes must not leak
    tau, B, S, a = _column(L=5, N=700, seed=2)
    ct = jnp.asarray(0.5, tau.dtype)
    m, W = stream_nodes(4)
    up_k, dn_k = monoflux_pallas(tau, B, S, a, ct, m, W, interpret=True)
    up_o, dn_o = disc._monoflux_scan(tau, B, S, a, ct, 4)
    np.testing.assert_allclose(np.asarray(up_k), np.asarray(up_o), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dn_k), np.asarray(dn_o), rtol=1e-12)


def test_kernel_f32_matches_scan_f32():
    # the TPU precision class: f32 end to end, tolerance at f32 roundoff
    tau, B, S, a = _column(dtype=np.float32)
    ct = jnp.cos(jnp.asarray(0.841, jnp.float32))
    m, W = stream_nodes(5)
    up_k, dn_k = monoflux_pallas(tau, B, S, a, ct, m, W, interpret=True)
    up_o, dn_o = disc._monoflux_scan(tau, B, S, a, ct, 5)
    ref = np.abs(np.asarray(up_o)).max()
    assert np.abs(np.asarray(up_k) - np.asarray(up_o)).max() < 3e-6 * ref
    ref_d = np.abs(np.asarray(dn_o)).max()
    assert np.abs(np.asarray(dn_k) - np.asarray(dn_o)).max() < 3e-6 * ref_d


def test_kernel_jvp_rides_the_scan_path(monkeypatch):
    # force the dispatcher onto the kernel path, then check jacfwd equals
    # the pure scan jacfwd (the custom JVP routes tangents through the scan)
    tau, B, S, a = _column(L=5, N=256, seed=3)
    ct = jnp.asarray(0.6, tau.dtype)

    def via_kernel(t):
        return disc._monoflux_kernel_path(t, B, S, a, ct, 4, False)[0].sum(
            axis=1
        )

    def via_scan(t):
        return disc._monoflux_scan(t, B, S, a, ct, 4)[0].sum(axis=1)

    # interpret-mode kernel on CPU: patch the pallas wrapper to interpret
    import clearsky_tpu.rt.march_pallas as mp

    orig = mp.monoflux_pallas
    monkeypatch.setattr(
        mp, "monoflux_pallas",
        lambda *args, **kw: orig(*args, **{**kw, "interpret": True}),
    )
    J_k = jax.jacfwd(via_kernel)(tau)
    J_s = jax.jacfwd(via_scan)(tau)
    np.testing.assert_allclose(np.asarray(J_k), np.asarray(J_s),
                               rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("nstream", [1, 5, 8])
def test_olr_kernel_matches_scan_oracle(nstream):
    """The TOA-only kernel (round 5) against the scan OLR on the adversarial
    column, including non-block-multiple widths."""
    from clearsky_tpu.rt.march_pallas import olr_pallas

    tau, B, S, a = _column(N=1500)
    m, W = stream_nodes(nstream)
    olr_k = olr_pallas(tau, B, m, W, interpret=True)
    olr_o = disc._olr_scan(tau, B, nstream)
    np.testing.assert_allclose(np.asarray(olr_k), np.asarray(olr_o),
                               rtol=1e-12, atol=1e-14)


def test_olr_kernel_path_jvp_rides_scan(monkeypatch):
    """jacfwd through outgoing_flux on the kernel path must agree with the
    scan path (the custom JVP routes tangents through _olr_scan)."""
    from clearsky_tpu.rt import march_pallas as mp

    tau, B, S, a = _column(L=6, N=256)
    orig = mp.olr_pallas
    monkeypatch.setattr(
        mp, "olr_pallas",
        lambda *args, **kw: orig(*args, **{**kw, "interpret": True}),
    )
    with disc.march_kernel_mode("interpret"):
        f_k = lambda t: disc.outgoing_flux(t, B, 5).sum()
        g_k = jax.grad(f_k)(tau)
    g_o = jax.grad(lambda t: disc._olr_scan(t, B, 5).sum())(tau)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o),
                               rtol=1e-10, atol=1e-12)


def test_vmapped_flux_paths_survive_kernel_routing(monkeypatch):
    """Round-5 review regression: custom_partitioning has no batching rule,
    so the kernel path must stay a plain pallas_call outside the explicit
    GSPMD scope — vmapped flux calls (batched sweeps, vmapped FD Jacobians)
    on a multi-device runtime must not crash."""
    from clearsky_tpu.rt import march_pallas as mp

    tau, B, S, a = _column(L=5, N=256)
    taub = jnp.stack([tau, tau * 1.1])
    Bb = jnp.stack([B, B])
    for orig_name in ("monoflux_pallas", "olr_pallas"):
        orig = getattr(mp, orig_name)
        monkeypatch.setattr(
            mp, orig_name,
            lambda *args, _o=orig, **kw: _o(*args, **{**kw, "interpret": True}),
        )
    assert len(jax.devices()) > 1  # the suite runs on 8 virtual devices
    with disc.march_kernel_mode("interpret"):
        out = jax.vmap(lambda t, b: disc.outgoing_flux(t, b, 5))(taub, Bb)
        up, dn = jax.vmap(
            lambda t, b: disc.monoflux(t, b, None, S, a, 0.841, 5)
        )(taub, Bb)
    ref = jax.vmap(lambda t, b: disc._olr_scan(t, b, 5))(taub, Bb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_vmapped_kernel_folds_batch_and_matches(monkeypatch):
    """The custom_vmap lane-fold rule: vmapped kernel marches (any batch-dim
    placement, including the mid-axis position a vmapped quadrature matmul
    produces) must execute ONE folded kernel call and match the scan."""
    tau, B, S, a = _column(L=5, N=256)
    taub = jnp.stack([tau, tau * 1.3])
    Bb = jnp.stack([B, B * 1.1])
    with disc.march_kernel_mode("interpret"):
        # axis-0 batch
        up0, dn0 = jax.vmap(
            lambda t, b: disc.monoflux(t, b, None, S, a, 0.841, 5)
        )(taub, Bb)
        # mid-axis batch (the failing sweep layout): in_axes=1
        up1, dn1 = jax.vmap(
            lambda t, b: disc.monoflux(t, b, None, S, a, 0.841, 5),
            in_axes=(1, 1),
        )(jnp.moveaxis(taub, 0, 1), jnp.moveaxis(Bb, 0, 1))
        olr = jax.vmap(lambda t, b: disc.outgoing_flux(t, b, 5))(taub, Bb)
    ct = jnp.cos(jnp.asarray(0.841, tau.dtype))
    for i in range(2):
        upr, dnr = disc._monoflux_scan(taub[i], Bb[i], S, a, ct, 5)
        np.testing.assert_allclose(np.asarray(up0[i]), np.asarray(upr),
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(up1[i]), np.asarray(upr),
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(dn0[i]), np.asarray(dnr),
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(
            np.asarray(olr[i]), np.asarray(disc._olr_scan(taub[i], Bb[i], 5)),
            rtol=1e-11, atol=1e-13)
