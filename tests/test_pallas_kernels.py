"""Pallas kernel equivalence vs XLA fallbacks (TPU-only; driven on hardware
in CI-less environments via the verify recipe).

(The nearest-center Pallas assignment kernel this file used to cover was
DELETED in round 3: the argmin lane reduce made the pure-XLA path 156x
faster than the old chunked scan at eval shapes — scripts/bench_assign_ab.py
— leaving the kernel without a consumer.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_cc_matches_fallback():
    import cl4wsis_tpu.ops.pallas_cc as pcc
    from cl4wsis_tpu.ops.cc import connected_components
    rs = np.random.RandomState(0)
    m = rs.rand(128, 128) > 0.45
    got = np.asarray(pcc.connected_components_pallas(jnp.asarray(m)))
    want = np.asarray(connected_components(jnp.asarray(m), 8))
    np.testing.assert_array_equal(got, want)


def test_assign_lanes_matches_scan_oracle():
    """The promoted argmin lane reduce == the retained chunked-scan oracle
    (any backend; eval-shaped slot counts)."""
    from cl4wsis_tpu.ops.grouping import assign_pixels, assign_pixels_scan
    rs = np.random.RandomState(1)
    H = W = 64
    offsets = jnp.asarray(rs.randn(H, W, 2).astype(np.float32) * 3)
    roots = jnp.asarray(rs.randint(0, 5, (H, W)), jnp.int32)
    S = 40
    cy = jnp.asarray(rs.randint(0, H, S), jnp.int32)
    cx = jnp.asarray(rs.randint(0, W, S), jnp.int32)
    cv = jnp.asarray(rs.rand(S) > 0.3)
    cr = jnp.asarray(rs.randint(0, 5, S), jnp.int32)
    got = np.asarray(assign_pixels(cy, cx, cv, cr, offsets, roots))
    want = np.asarray(assign_pixels_scan(cy, cx, cv, cr, offsets, roots))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_stamp_matches_xla_scan():
    """Batched Pallas stamping == vmapped XLA stamp_centers, bit-equal,
    incl. off-plane and invalid slots and both production sigmas."""
    from functools import partial

    from cl4wsis_tpu.ops.labelgen import stamp_centers
    from cl4wsis_tpu.ops.pallas_stamp import stamp_centers_batched_pallas

    for sigma, H, C, K, B in [(6, 64, 5, 12, 3), (8, 128, 4, 8, 2)]:
        W = H
        rs = np.random.RandomState(sigma)
        cy = rs.uniform(-5, H + 5, (B, K)).astype(np.float32)
        cx = rs.uniform(-5, W + 5, (B, K)).astype(np.float32)
        cls = rs.randint(0, C, (B, K)).astype(np.int32)
        valid = rs.rand(B, K) > 0.3
        got = np.asarray(stamp_centers_batched_pallas(
            jnp.asarray(valid), jnp.asarray(cy), jnp.asarray(cx),
            jnp.asarray(cls), C, sigma, (H, W)))
        want = np.asarray(jax.jit(jax.vmap(partial(
            stamp_centers, num_classes=C, sigma=sigma, shape=(H, W))))(
            jnp.asarray(valid), jnp.asarray(cy), jnp.asarray(cx),
            jnp.asarray(cls)))
        assert got.any()
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_seg_run_totals_matches_segsort():
    """Pallas run-totals kernel == the segsort composition, bit-exact,
    incl. singleton runs, a full-row run, and the vmapped (custom_vmap)
    batched path."""
    import cl4wsis_tpu.ops.pallas_seg as pseg

    rs = np.random.RandomState(0)
    B, N = 3, 2048
    k = np.sort(rs.randint(0, 90, (B, N)).astype(np.int32), axis=1)
    k[2, :] = 5
    v1 = rs.randint(0, 50, (B, N)).astype(np.int32)
    v2 = rs.randint(0, 50, (B, N)).astype(np.int32)
    v3 = rs.randint(0, 2, (B, N)).astype(np.int32)
    got = pseg.run_totals_pallas(jnp.asarray(k), jnp.asarray(v1),
                                 jnp.asarray(v2), jnp.asarray(v3))
    old = pseg.ENABLED
    try:
        pseg.ENABLED = False
        want = pseg.run_totals(jnp.asarray(k), jnp.asarray(v1),
                               jnp.asarray(v2), jnp.asarray(v3))
    finally:
        pseg.ENABLED = old
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # vmapped per-image entry (the factory call shape)
    vm = jax.jit(jax.vmap(pseg.run_totals1))(
        jnp.asarray(k), jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(v3))
    for g, w in zip(vm, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_topk_matches_lax_topk():
    """Iterative-extraction top-k == jax.lax.top_k bit-exact, including
    tie order (stable, lower index first), sparse NMS-like rows, and a
    100-way tie block."""
    import cl4wsis_tpu.ops.pallas_topk as ptk

    rs = np.random.RandomState(0)
    for (B, N, k) in [(4, 4096, 7), (8, 262144, 25)]:
        x = rs.rand(B, N).astype(np.float32)
        x[0] = -1.0
        nz = rs.choice(N, 40, replace=False)
        x[0, nz] = rs.choice([0.5, 0.9, 0.9, 0.7], 40)
        x[1, :100] = 0.25
        xv = jnp.asarray(x)
        wv, wi = jax.lax.top_k(xv, k)
        gv, gi = ptk.topk_pallas(xv, k)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_topk_neg_inf_rows():
    """Round-5 ADVICE fix: rows with -inf entries and FEWER than k finite
    values must match jax.lax.top_k (the old -inf knockout made extracted
    winners indistinguishable from genuine -inf, duplicating indices)."""
    import cl4wsis_tpu.ops.pallas_topk as ptk

    rs = np.random.RandomState(3)
    B, N, k = 3, 4096, 9
    x = np.full((B, N), -np.inf, np.float32)
    x[0, [5, 99, 1033]] = [0.5, 0.9, 0.7]       # 3 finite < k
    x[1] = rs.rand(N)                            # all finite
    # row 2: all -inf -> top_k returns -inf at indices 0..k-1
    xv = jnp.asarray(x)
    wv, wi = jax.lax.top_k(xv, k)
    gv, gi = ptk.topk_pallas(xv, k)
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


def test_stamp_large_sigma_dispatches_to_xla():
    """sigma > 21 exceeds the Pallas 256-lane rotate pad: the public entry
    must fall back to the vmapped XLA scan (and not trip the kernel assert).
    Runs on any backend; on TPU it exercises the real dispatch."""
    from functools import partial

    from cl4wsis_tpu.ops.labelgen import stamp_centers
    from cl4wsis_tpu.ops.pallas_stamp import stamp_centers_batched

    sigma, H, C, K, B = 22, 256, 2, 4, 1
    rs = np.random.RandomState(22)
    cy = rs.uniform(0, H, (B, K)).astype(np.float32)
    cx = rs.uniform(0, H, (B, K)).astype(np.float32)
    cls = rs.randint(0, C, (B, K)).astype(np.int32)
    valid = np.ones((B, K), bool)
    got = np.asarray(stamp_centers_batched(
        jnp.asarray(valid), jnp.asarray(cy), jnp.asarray(cx),
        jnp.asarray(cls), num_classes=C, sigma=sigma, shape=(H, H)))
    want = np.asarray(jax.vmap(partial(
        stamp_centers, num_classes=C, sigma=sigma, shape=(H, H)))(
        jnp.asarray(valid), jnp.asarray(cy), jnp.asarray(cx),
        jnp.asarray(cls)))
    np.testing.assert_array_equal(got, want)
