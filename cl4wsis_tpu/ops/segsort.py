"""Sorted-domain segment reductions — the TPU-native replacement for
``jax.ops.segment_*`` over large key spaces.

XLA:TPU lowers scatter (what segment_sum/segment_max become) to a SERIAL
per-update loop: on the round-3 phase-2 trace each segment op over 4M
inputs cost ~36 ms (~1 GB/s), and per-pixel table gathers ran at ~3 GB/s —
together they dominated the whole train step. A batched ``lax.sort`` of
the same 4M elements costs ~4.6 ms, and segmented scans are a few ms, so
any "scatter to a table, gather it back per pixel" pattern is strictly
cheaper as:

    sort by key -> segmented scans in sorted order -> (optionally) sort
    back by original index

All helpers below operate on 1-D arrays (one image); callers ``jax.vmap``
over the batch, which lowers the sorts/scans to batched kernels.

Used by the phase-2 label factory (ops/pseudo_labels.py, ops/refine.py),
replacing the reference's per-image cv2 stats loops
(``/root/reference/modules/utils.py:224,307``) at full exactness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_by(key: jnp.ndarray, *payloads: jnp.ndarray):
    """Sort `key` ascending, carrying `payloads`. Returns (skey, *spayloads).

    Not stable: segment reductions below are order-independent within a
    run, and payloads that must identify positions carry unique values.
    """
    return jax.lax.sort((key,) + payloads, num_keys=1, is_stable=False)


def run_starts(skeys: jnp.ndarray) -> jnp.ndarray:
    """True where a new equal-key run begins (position 0 included)."""
    s = skeys != jnp.roll(skeys, 1)
    return s.at[0].set(True)


def run_ends(skeys: jnp.ndarray) -> jnp.ndarray:
    """True at the last element of each equal-key run."""
    e = skeys != jnp.roll(skeys, -1)
    return e.at[-1].set(True)


def _seg_combine_sum(a, b):
    va, ra = a
    vb, rb = b
    return jnp.where(rb, vb, va + vb), ra | rb


def _seg_combine_copy(a, b):
    va, ra = a
    vb, rb = b
    return jnp.where(rb, vb, va), ra | rb


def seg_fill_first(vals: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Each element takes the value at its run's FIRST position."""
    v, _ = jax.lax.associative_scan(_seg_combine_copy, (vals, starts))
    return v


def seg_fill_last(vals: jnp.ndarray, ends: jnp.ndarray) -> jnp.ndarray:
    """Each element takes the value at its run's LAST position."""
    v, _ = jax.lax.associative_scan(_seg_combine_copy, (vals, ends),
                                    reverse=True)
    return v


def seg_total(vals: jnp.ndarray, starts: jnp.ndarray,
              ends: jnp.ndarray) -> jnp.ndarray:
    """Per-element total (sum) of its run."""
    c, _ = jax.lax.associative_scan(_seg_combine_sum, (vals, starts))
    return seg_fill_last(c, ends)


def seg_length(starts: jnp.ndarray, ends: jnp.ndarray) -> jnp.ndarray:
    """Per-element length of its run (contiguity makes this two copies)."""
    n = starts.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    first = seg_fill_first(iota, starts)
    last = seg_fill_last(iota, ends)
    return last - first + 1


def select_flagged(flags: jnp.ndarray, k: int) -> jnp.ndarray:
    """Positions of the first `k` True flags, in order; N where exhausted.

    cumsum(flags) is non-decreasing, so the r-th flagged position is
    searchsorted(cum, r+1) — the same sort-free pattern as
    ops/cc.select_components, over an arbitrary (possibly sorted-domain)
    flag array."""
    n = flags.shape[0]
    cum = jnp.cumsum(flags.astype(jnp.int32))
    pos = jnp.searchsorted(cum, jnp.arange(1, k + 1, dtype=jnp.int32),
                           side="left")
    return jnp.minimum(pos, n).astype(jnp.int32)
