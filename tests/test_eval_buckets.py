"""Shape-bucketed validation (VERDICT r1 item 4): one compiled program per
size bucket instead of one per unique image size, with the pad region
masked out so instance extraction is invariant to the padding."""

import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.models import CL4WSISModel
from cl4wsis_tpu.ops.instance_postproc import get_ins_map
from cl4wsis_tpu.train.eval import (make_eval_forward, mask_pad_region,
                                    pick_bucket)


def test_pick_bucket():
    assert pick_bucket(300, 64) == 320
    assert pick_bucket(512, 64) == 512
    assert pick_bucket(600, 64) == 640
    assert pick_bucket(65, 64) == 128
    # VOC val native sizes (281..500) need <= 4 programs at 64-granularity
    assert len({pick_bucket(m, 64) for m in range(281, 501)}) <= 4


def _two_instance_case(H=48, W=40, C=2):
    seg_prob = np.zeros((H, W, C + 1), np.float32)
    seg_prob[..., 0] = 1.0
    center = np.zeros((H, W, C), np.float32)
    offset = np.zeros((H, W, 2), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for (cy, cx) in [(14, 12), (34, 28)]:
        blob = (np.abs(yy - cy) <= 6) & (np.abs(xx - cx) <= 6)
        seg_prob[..., 1][blob] = 1.0
        seg_prob[..., 0][blob] = 0.0
        center[..., 0] = np.maximum(
            center[..., 0], np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0))
        offset[..., 0][blob] = (cy - yy)[blob]
        offset[..., 1][blob] = (cx - xx)[blob]
    return seg_prob, center, offset


def test_get_ins_map_pad_invariant():
    """Padding + mask_pad_region must not change the extracted instances:
    same slots, same scores, same ins_map in the valid region, nothing in
    the pad region."""
    H, W, B = 48, 40, 64
    seg_prob, center, offset = _two_instance_case(H, W)

    out0 = get_ins_map(jnp.asarray(seg_prob), jnp.asarray(center),
                       jnp.asarray(offset), num_classes=2, val_kernel=15)

    pad = lambda a: np.pad(a, ((0, B - H), (0, B - W), (0, 0)))  # noqa: E731
    # pad with garbage (not zeros) to prove the mask does the work
    sp = pad(seg_prob) + 0.0
    sp[H:, :, 1] = 0.9
    sp[:, W:, 2] = 0.9
    ct = pad(center)
    ct[H:, :, :] = 1.0
    off = pad(offset)
    spm, ctm, offm = mask_pad_region(jnp.asarray(sp), jnp.asarray(ct),
                                     jnp.asarray(off),
                                     jnp.asarray([H, W], jnp.int32))
    out1 = get_ins_map(spm, ctm, offm, num_classes=2, val_kernel=15)

    np.testing.assert_array_equal(np.asarray(out0["valid"]),
                                  np.asarray(out1["valid"]))
    np.testing.assert_array_equal(np.asarray(out0["label"]),
                                  np.asarray(out1["label"]))
    np.testing.assert_allclose(np.asarray(out0["score"]),
                               np.asarray(out1["score"]), atol=1e-6)
    ins1 = np.asarray(out1["ins_map"])
    np.testing.assert_array_equal(np.asarray(out0["ins_map"]), ins1[:H, :W])
    assert (ins1[H:, :] < 0).all() and (ins1[:, W:] < 0).all()


def test_eval_forward_bucketed_compile_count():
    """>= 8 distinct val image sizes -> exactly ONE compiled program (all
    sizes fall in the single 64 bucket); the exact path never compiles."""
    model = CL4WSISModel(classes=(2, 1), pooling_size=4, has_instance=True,
                         backbone_structure=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = make_eval_forward(model, variables, num_classes=2,
                            bucket_multiple=64)
    rs = np.random.RandomState(0)
    sizes = [(33, 47), (40, 40), (48, 33), (64, 64), (37, 59),
             (59, 37), (41, 63), (63, 41)]
    for (h, w) in sizes:
        img = rs.randn(1, h, w, 3).astype(np.float32)
        out = fwd(jnp.asarray(img), (h, w))
        assert np.asarray(out["ins_map"]).shape == (h, w)
    exact, bucketed = fwd._jitted
    assert bucketed._cache_size() == 1, bucketed._cache_size()
    assert exact._cache_size() == 0

    # target size != image size (crop_val-style) falls back to exact path
    img = rs.randn(1, 32, 32, 3).astype(np.float32)
    out = fwd(jnp.asarray(img), (40, 44))
    assert np.asarray(out["ins_map"]).shape == (40, 44)
    assert exact._cache_size() == 1
