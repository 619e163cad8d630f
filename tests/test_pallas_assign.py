"""Pallas assignment kernel vs the scan fallback (TPU-only; the kernel is
driven on hardware in CI-less environments via the verify recipe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_assign_matches_scan():
    import cl4wsis_tpu.ops.pallas_assign as pa
    from cl4wsis_tpu.ops.grouping import assign_pixels
    rs = np.random.RandomState(0)
    H = W = 64
    offsets = jnp.asarray(rs.randn(H, W, 2).astype(np.float32) * 3)
    roots = jnp.asarray(rs.randint(0, 3, (H, W)), jnp.int32)
    S = 24
    cy = jnp.asarray(rs.randint(0, H, S), jnp.int32)
    cx = jnp.asarray(rs.randint(0, W, S), jnp.int32)
    cv = jnp.asarray(rs.rand(S) > 0.3)
    cr = jnp.asarray(rs.randint(0, 3, S), jnp.int32)
    got = np.asarray(pa.assign_pixels_pallas(cy, cx, cv, cr, offsets, roots))
    want = np.asarray(assign_pixels(cy, cx, cv, cr, offsets, roots))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only kernel")
def test_pallas_cc_matches_fallback():
    import cl4wsis_tpu.ops.pallas_cc as pcc
    from cl4wsis_tpu.ops.cc import connected_components
    rs = np.random.RandomState(0)
    m = rs.rand(128, 128) > 0.45
    got = np.asarray(pcc.connected_components_pallas(jnp.asarray(m)))
    want = np.asarray(connected_components(jnp.asarray(m), 8))
    np.testing.assert_array_equal(got, want)
