import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.ops.labelgen import batched_label_generation, label_generation


def _reference_label_generation(seg_map, mask, num_classes, sigma):
    """Numpy transcription of the reference algorithm
    (dataset/utils.py:180-350) used as a golden fixture."""
    size = 6 * sigma + 3
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = 3 * sigma + 1
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))

    H, W = mask.shape
    offset = np.zeros((2, H, W), np.float32)
    weight = np.zeros((1, H, W), np.float32)
    center = np.zeros((num_classes, H, W), np.float32)
    yc = np.cumsum(np.ones_like(mask, np.float32), 0) - 1
    xc = np.cumsum(np.ones_like(mask, np.float32), 1) - 1
    for iid in np.unique(mask):
        if iid in (0, 255):
            continue
        weight[0, mask == iid] = 1
        mi = np.where(mask == iid)
        cy, cx = np.mean(mi[0]), np.mean(mi[1])
        yy, xx = int(cy), int(cx)
        cls = int(seg_map[mi][0]) - 1
        ul = int(np.round(xx - 3 * sigma - 1)), int(np.round(yy - 3 * sigma - 1))
        br = int(np.round(xx + 3 * sigma + 2)), int(np.round(yy + 3 * sigma + 2))
        c, d = max(0, -ul[0]), min(br[0], W) - ul[0]
        a, b = max(0, -ul[1]), min(br[1], H) - ul[1]
        cc, dd = max(0, ul[0]), min(br[0], W)
        aa, bb = max(0, ul[1]), min(br[1], H)
        center[cls, aa:bb, cc:dd] = np.maximum(center[cls, aa:bb, cc:dd], g[a:b, c:d])
        offset[0][mi] = cy - yc[mi]
        offset[1][mi] = cx - xc[mi]
    return center, offset, weight


def _fixture(H=48, W=48):
    seg = np.zeros((H, W), np.int32)
    inst = np.zeros((H, W), np.int32)
    # instance 1: class 2 blob near top-left
    seg[4:14, 6:16] = 2
    inst[4:14, 6:16] = 1
    # instance 2: class 1 blob bottom-right (near the boundary, clips kernel)
    seg[40:48, 42:48] = 1
    inst[40:48, 42:48] = 2
    # instance 3: class 2 again, center
    seg[20:30, 20:34] = 2
    inst[20:30, 20:34] = 3
    # some ignore pixels
    seg[0, :] = 255
    return seg, inst


def test_matches_reference_algorithm():
    seg, inst = _fixture()
    c, o, w = label_generation(jnp.asarray(seg), jnp.asarray(inst),
                               num_classes=3, sigma=3, max_inst=8)
    rc, ro, rw = _reference_label_generation(seg, inst, 3, 3)
    np.testing.assert_allclose(np.asarray(c), rc.transpose(1, 2, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o)[..., 0], ro[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(o)[..., 1], ro[1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(w)[..., 0], rw[0], atol=1e-5)


def test_empty_mask():
    seg = np.zeros((16, 16), np.int32)
    inst = np.zeros((16, 16), np.int32)
    c, o, w = label_generation(jnp.asarray(seg), jnp.asarray(inst),
                               num_classes=2, sigma=2, max_inst=4)
    assert float(jnp.sum(c)) == 0.0
    assert float(jnp.sum(jnp.abs(o))) == 0.0
    assert float(jnp.sum(w)) == 0.0


def test_batched():
    seg, inst = _fixture()
    segs = jnp.stack([jnp.asarray(seg)] * 2)
    insts = jnp.stack([jnp.asarray(inst)] * 2)
    c, o, w = batched_label_generation(segs, insts, num_classes=3, sigma=3,
                                       max_inst=8)
    assert c.shape == (2, 48, 48, 3)
    np.testing.assert_allclose(np.asarray(c[0]), np.asarray(c[1]))


def test_batched_matches_vmapped_oracle():
    """The restructured batched path (lane-compare stats + batched stamp +
    select-sum offsets) matches vmap(label_generation) (scatter stats +
    per-sample windowed stamp + centroid gather) to float tolerance, on a
    batch with DIFFERENT per-sample instances, empties, and ignore
    pixels. Not bit-equal by design: the batched path's int32-exact
    coordinate sums round centroids one ulp differently from the oracle's
    f32 scatter-adds (the batched value is the more exact one), and the
    gaussian exp magnifies that ulp into ~1e-11 absolute."""
    import jax

    seg0, inst0 = _fixture()
    seg1 = np.zeros_like(seg0)
    inst1 = np.zeros_like(inst0)
    seg1[2:9, 30:44] = 1
    inst1[2:9, 30:44] = 1
    seg1[40:44, 0:3] = 2       # clips the stamp window at the corner
    inst1[40:44, 0:3] = 2
    seg1[41, 1] = 255          # ignore inside an instance
    inst1[41, 1] = 255
    seg2 = np.zeros_like(seg0)  # empty sample
    inst2 = np.zeros_like(inst0)
    segs = jnp.asarray(np.stack([seg0, seg1, seg2]))
    insts = jnp.asarray(np.stack([inst0, inst1, inst2]))

    c, o, w = batched_label_generation(segs, insts, num_classes=3, sigma=3,
                                       max_inst=8)
    fn = lambda s, i: label_generation(s, i, num_classes=3, sigma=3,
                                       max_inst=8)
    rc, ro, rw = jax.vmap(fn)(segs, insts)
    np.testing.assert_allclose(np.asarray(c), np.asarray(rc),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ro),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(w), np.asarray(rw))


def test_windowed_stamp_matches_scan_oracle():
    """stamp_centers (windowed DUS) is bit-equal to the full-plane scan
    oracle under jit, incl. corner centers, invalid slots, mixed classes."""
    import jax
    from functools import partial

    from cl4wsis_tpu.ops.labelgen import stamp_centers, stamp_centers_scan

    H = W = 64
    C, K = 5, 12
    for sigma in (4, 6, 8):
        f_win = jax.jit(partial(stamp_centers, num_classes=C, sigma=sigma,
                                shape=(H, W)))
        f_scan = jax.jit(partial(stamp_centers_scan, num_classes=C,
                                 sigma=sigma, shape=(H, W)))
        rng = np.random.RandomState(sigma)
        cy = rng.uniform(0, H - 1, K).astype(np.float32)
        cx = rng.uniform(0, W - 1, K).astype(np.float32)
        # force corner/edge centers into the slot set
        cy[:4] = [0.0, H - 1, 0.0, H - 1]
        cx[:4] = [0.0, 0.0, W - 1, W - 1]
        cls = rng.randint(0, C, K).astype(np.int32)
        valid = rng.rand(K) > 0.3
        a = np.asarray(f_win(jnp.asarray(valid), jnp.asarray(cy),
                             jnp.asarray(cx), jnp.asarray(cls)))
        b = np.asarray(f_scan(jnp.asarray(valid), jnp.asarray(cy),
                              jnp.asarray(cx), jnp.asarray(cls)))
        assert np.array_equal(a, b), (sigma, np.abs(a - b).max())
        # all-invalid stamps nothing
        z = np.asarray(f_win(jnp.zeros(K, bool), jnp.asarray(cy),
                             jnp.asarray(cx), jnp.asarray(cls)))
        assert not z.any()
        # off-plane centers stamp nothing (reference center_map_gen skips
        # out-of-boundary centers entirely) — both paths, still bit-equal
        cy2 = cy.copy()
        cx2 = cx.copy()
        cy2[:4] = [-1.0, H + 0.5, 10.0, -0.001]
        cx2[:4] = [10.0, 10.0, W + 3.0, 10.0]
        a2 = np.asarray(f_win(jnp.asarray(valid), jnp.asarray(cy2),
                              jnp.asarray(cx2), jnp.asarray(cls)))
        b2 = np.asarray(f_scan(jnp.asarray(valid), jnp.asarray(cy2),
                               jnp.asarray(cx2), jnp.asarray(cls)))
        assert np.array_equal(a2, b2), (sigma, np.abs(a2 - b2).max())
        only_off = np.asarray(f_win(
            jnp.asarray(np.arange(K) < 4), jnp.asarray(cy2),
            jnp.asarray(cx2), jnp.asarray(cls)))
        assert not only_off.any()

    # vmapped (the phase-2 factory path): batch of slot sets
    f_v = jax.jit(jax.vmap(partial(stamp_centers, num_classes=C, sigma=6,
                                   shape=(H, W))))
    f_vs = jax.jit(jax.vmap(partial(stamp_centers_scan, num_classes=C,
                                    sigma=6, shape=(H, W))))
    rng = np.random.RandomState(0)
    B = 3
    cy = rng.uniform(0, H - 1, (B, K)).astype(np.float32)
    cx = rng.uniform(0, W - 1, (B, K)).astype(np.float32)
    cls = rng.randint(0, C, (B, K)).astype(np.int32)
    valid = rng.rand(B, K) > 0.3
    a = np.asarray(f_v(jnp.asarray(valid), jnp.asarray(cy), jnp.asarray(cx),
                       jnp.asarray(cls)))
    b = np.asarray(f_vs(jnp.asarray(valid), jnp.asarray(cy), jnp.asarray(cx),
                        jnp.asarray(cls)))
    assert np.array_equal(a, b), np.abs(a - b).max()
