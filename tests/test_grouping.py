"""Standalone golden tests for the grouping ops vs torch transcriptions."""

import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.ops.grouping import (assign_pixels, assign_pixels_scan,
                                      cluster_peaks, find_instance_centers)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
F = torch.nn.functional


def _torch_group_pixels(ctr, offsets):
    """Transcription of modules/utils.py:505-542."""
    offsets = offsets.squeeze(0)
    H, W = offsets.size()[1:]
    yc = torch.arange(H, dtype=offsets.dtype).repeat(1, W, 1).transpose(1, 2)
    xc = torch.arange(W, dtype=offsets.dtype).repeat(1, H, 1)
    coord = torch.cat((yc, xc), 0)
    loc = (coord + offsets).reshape(2, H * W).transpose(1, 0)
    d = torch.norm(ctr.unsqueeze(1).float() - loc.unsqueeze(0), dim=-1)
    return torch.argmin(d, dim=0).reshape(H, W)


def test_assign_pixels_matches_group_pixels():
    rs = np.random.RandomState(0)
    H = W = 24
    offsets = rs.randn(H, W, 2).astype(np.float32) * 3
    ctr = np.array([[5, 5], [18, 12], [10, 20]], np.int32)

    args = (jnp.asarray(ctr[:, 0]), jnp.asarray(ctr[:, 1]),
            jnp.ones(3, bool), jnp.zeros(3, jnp.int32),
            jnp.asarray(offsets), jnp.zeros((H, W), jnp.int32))

    ot = torch.from_numpy(offsets).permute(2, 0, 1)[None]
    want = _torch_group_pixels(torch.from_numpy(ctr).long(), ot).numpy()
    np.testing.assert_array_equal(np.asarray(assign_pixels(*args)), want)
    np.testing.assert_array_equal(
        np.asarray(assign_pixels_scan(*args, chunk=4)), want)


def test_assign_pixels_root_gating():
    """Pixels may only bind to centers of their own component."""
    H = W = 8
    offsets = jnp.zeros((H, W, 2))
    roots = jnp.zeros((H, W), jnp.int32).at[:, 4:].set(1)
    # one center per root, placed in the WRONG half geometrically
    ctr_y = jnp.asarray([0, 0])
    ctr_x = jnp.asarray([7, 0])   # center 0 lives in right half but root 0
    roots_of_ctr = jnp.asarray([0, 1])
    for fn in (assign_pixels,
               lambda *a: assign_pixels_scan(*a, chunk=2)):
        out = np.asarray(fn(ctr_y, ctr_x, jnp.ones(2, bool),
                            roots_of_ctr, offsets, roots))
        assert (out[:, :4] == 0).all()  # left pixels -> center 0 (same root)
        assert (out[:, 4:] == 1).all()


def test_find_instance_centers_threshold_and_nms():
    h = np.zeros((16, 16), np.float32)
    h[4, 4] = 0.9
    h[4, 6] = 0.8   # suppressed by NMS (within kernel 5 of the 0.9 peak)
    h[12, 12] = 0.05  # below threshold
    ys, xs, valid = (np.asarray(a) for a in find_instance_centers(
        jnp.asarray(h), threshold=0.1, nms_kernel=5, max_ctr=4))
    pts = set(zip(ys[valid].tolist(), xs[valid].tolist()))
    assert pts == {(4, 4)}


def test_cluster_peaks_matches_cv2():
    H = W = 32
    offsets = np.ones((H, W, 2), np.float32) * 10
    fg = np.zeros((H, W), bool)
    # a ~21px low-magnitude blob inside fg
    fg[5:12, 5:12] = True
    offsets[7:10, 6:13] = 0.0  # 3x7 = 21 px, clipped by fg to 3x6=18... make inside
    offsets[7:10, 5:12] = 10.0
    offsets[7:10, 5:12][:, :7] = 0.0  # 3x7 inside fg
    ys, xs, valid = (np.asarray(a) for a in cluster_peaks(
        jnp.asarray(offsets), jnp.asarray(fg), beta=5, max_peaks=4))
    mag = np.sqrt((offsets ** 2).sum(-1))
    weak = ((mag < 2.5) & fg).astype(np.uint8)
    n, labels, stats, centroids = cv2.connectedComponentsWithStats(weak, connectivity=4)
    want = [(int(centroids[k][1]), int(centroids[k][0])) for k in range(n)
            if 16 < stats[k, cv2.CC_STAT_AREA] < 26]
    got = sorted(zip(ys[valid].tolist(), xs[valid].tolist()))
    assert got == sorted(want)


def test_assign_pixels_classbanks_matches_lanes():
    """The class-banked assignment must equal the full-S lane reduce on
    slots produced by the REAL slot builder (root purity is the invariant
    the bank form relies on), across several random scenes."""
    import jax
    import jax.numpy as jnp
    from cl4wsis_tpu.ops.cc import connected_components_multilabel
    from cl4wsis_tpu.ops.grouping import assign_pixels_classbanks
    from cl4wsis_tpu.ops.refine import _global_center_slots

    H = W = 56
    C, mc, mcl = 3, 4, 2
    for seed in range(3):
        rng = np.random.RandomState(seed)
        # blobby multi-class seg map: smooth random field -> argmax
        f = rng.randn(7, 7, C + 1).astype(np.float32)
        f = np.asarray(jax.image.resize(jnp.asarray(f), (H, W, C + 1),
                                        "linear"))
        seg = np.argmax(f * 3.0 + rng.randn(H, W, C + 1) * 0.1,
                        axis=-1).astype(np.int32)
        center = (rng.rand(H, W, C).astype(np.float32) ** 8) * 1.2
        offsets = (rng.randn(H, W, 2) * 3).astype(np.float32)

        seg_j = jnp.asarray(seg)
        roots = connected_components_multilabel(seg_j, connectivity=8,
                                                num_iters=32)
        slots, _, _ = _global_center_slots(
            seg_j, roots, jnp.asarray(center), jnp.asarray(offsets),
            0.1, 5, 3.0, mc, mcl, 32, C, max_inst_cap=False)
        args = (slots["ys"], slots["xs"], slots["valid"], slots["root"],
                jnp.asarray(offsets), roots)
        want = np.asarray(assign_pixels(*args))
        got = np.asarray(assign_pixels_classbanks(
            *args, jnp.clip(seg_j - 1, 0), num_classes=C, max_ctr=mc,
            max_cluster=mcl))
        np.testing.assert_array_equal(got, want)
