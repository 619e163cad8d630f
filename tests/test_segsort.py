"""Golden tests for the sorted-domain segment toolkit (ops/segsort.py)
against direct numpy reductions."""

import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.ops import segsort as ss


def _mk(n=4096, n_keys=37, seed=0):
    rs = np.random.RandomState(seed)
    keys = rs.randint(0, n_keys, n).astype(np.int32)
    vals = rs.randn(n).astype(np.float32)
    return keys, vals


def test_seg_total_and_length():
    keys, vals = _mk()
    sk, sv = ss.sort_by(jnp.asarray(keys), jnp.asarray(vals))
    st, en = ss.run_starts(sk), ss.run_ends(sk)
    tot = np.asarray(ss.seg_total(sv, st, en))
    ln = np.asarray(ss.seg_length(st, en))
    sk = np.asarray(sk)
    sv = np.asarray(sv)
    for k in np.unique(keys):
        m = sk == k
        np.testing.assert_allclose(tot[m], sv[m].sum(), rtol=1e-5)
        assert (ln[m] == m.sum()).all()


def test_fill_first_last():
    keys, vals = _mk(n=1000, n_keys=11, seed=1)
    sk, sv = ss.sort_by(jnp.asarray(keys), jnp.asarray(vals))
    st, en = ss.run_starts(sk), ss.run_ends(sk)
    ff = np.asarray(ss.seg_fill_first(sv, st))
    fl = np.asarray(ss.seg_fill_last(sv, en))
    sk, sv = np.asarray(sk), np.asarray(sv)
    for k in np.unique(keys):
        idx = np.nonzero(sk == k)[0]
        assert (ff[idx] == sv[idx[0]]).all()
        assert (fl[idx] == sv[idx[-1]]).all()


def test_select_flagged():
    rs = np.random.RandomState(2)
    flags = rs.rand(500) < 0.05
    pos = np.asarray(ss.select_flagged(jnp.asarray(flags), 10))
    want = np.nonzero(flags)[0]
    k = min(10, len(want))
    np.testing.assert_array_equal(pos[:k], want[:k])
    assert (pos[k:] == 500).all()


def test_single_run_and_empty_flags():
    # one giant run; no flags set
    keys = jnp.zeros((256,), jnp.int32)
    vals = jnp.ones((256,), jnp.float32)
    st, en = ss.run_starts(keys), ss.run_ends(keys)
    assert float(ss.seg_total(vals, st, en)[0]) == 256.0
    assert int(ss.seg_length(st, en)[100]) == 256
    pos = ss.select_flagged(jnp.zeros((256,), bool), 4)
    assert (np.asarray(pos) == 256).all()
