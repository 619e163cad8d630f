"""Validation loops: instance mAP and semantic mIoU.

Re-design of reference ``train.py:588-745``. Differences, by design:
the per-image post-processing runs on device (ops/instance_postproc.py)
and only the compact slot-id map crosses to host; matching + AP run in
numpy (metrics/voc_ap.py). The reference evaluates the full val set on
every rank (``run.py:75-77``); here each process evaluates its shard and
accumulators merge at the end (documented deliberate difference,
SURVEY.md §7 hard-parts #5).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.metrics.stream import StreamSegMetrics
from cl4wsis_tpu.metrics.voc_ap import InstanceAPAccumulator, ins_map_iou
from cl4wsis_tpu.ops.instance_postproc import get_ins_map
from cl4wsis_tpu.ops.resize import resize_bilinear


def make_eval_forward(model, variables, num_classes: int, val_flip: bool = False,
                      val_thresh: float = 0.1, val_kernel: int = 41,
                      beta: float = 3.0,
                      bucket_multiple: Optional[int] = 64,
                      max_ctr: int = 32, max_cluster: int = 8) -> Callable:
    """Jitted: image (1,H,W,3) -> instance slots at `target_size`.

    `variables` is passed as a jit argument (NOT closed over) so the params
    stay device buffers instead of being baked into the program as
    constants.

    When ``bucket_multiple`` is set and the image is already at
    ``target_size`` (the reference val protocol — native-size images,
    ``train.py:588-651``), the image is zero-padded to a square bucket
    (max(H, W) rounded up to the multiple) and ONE program per bucket
    serves every image size in it: the pad region is masked to background
    before instance extraction (so it can produce no centers/foreground)
    and the returned maps are cropped back. A full VOC val epoch (native
    sizes 281..500) then compiles ≤ 4 programs instead of one per unique
    image size, and padding waste is bounded by the multiple. Pass
    ``bucket_multiple=None`` for the exact per-size path.
    """

    def _postproc(pred, out_hw, valid_hw):
        pred = {k: resize_bilinear(v, out_hw, align_corners=False)
                for k, v in pred.items()}
        seg_prob = jax.nn.softmax(pred["seg"].astype(jnp.float32), axis=-1)
        center = pred["center"].astype(jnp.float32)
        if val_flip:
            seg_prob = (seg_prob[0] + jnp.flip(seg_prob[1], axis=1)) / 2.0
            center = (center[0] + jnp.flip(center[1], axis=1)) / 2.0
        else:
            seg_prob, center = seg_prob[0], center[0]
        offset = pred["offset"][0].astype(jnp.float32)
        # NOTE on offset magnitudes: the reference multiplies offsets by
        # target/out_size (dataset/utils.py:829-831), but out_size is read
        # AFTER the interpolation to target size, so the factor is exactly 1
        # — offsets keep their input-pixel scale. Matched here (no rescale).
        if valid_hw is not None:
            seg_prob, center, offset = mask_pad_region(
                seg_prob, center, offset, valid_hw)
        # eval default max_ctr=32 (vs 16 in training refine): approximates
        # the reference's unbounded top_k=10000 for crowded scenes; the
        # "truncated" counter surfaces any residual saturation
        return get_ins_map(seg_prob, center, offset, num_classes=num_classes,
                           val_thresh=val_thresh, val_kernel=val_kernel,
                           beta=beta, max_ctr=max_ctr, max_cluster=max_cluster)

    def _apply(variables, image):
        imgs = jnp.concatenate([image, jnp.flip(image, axis=2)], axis=0) \
            if val_flip else image
        pred, _ = model.apply(variables, imgs, train=False, interpolate=False)
        return pred

    @partial(jax.jit, static_argnames=("target_size",))
    def forward_exact(variables, image, target_size):
        return _postproc(_apply(variables, image), target_size, None)

    @partial(jax.jit, static_argnames=("bucket",))
    def forward_bucketed(variables, image, valid_hw, bucket):
        # `image` is zero-padded to (bucket, bucket); valid_hw is traced, so
        # every image size below the bucket reuses this one program
        return _postproc(_apply(variables, image), (bucket, bucket), valid_hw)

    def fwd(image, target_size):
        h, w = int(image.shape[1]), int(image.shape[2])
        if bucket_multiple is None or (h, w) != tuple(target_size):
            return forward_exact(variables, image, tuple(target_size))
        b = pick_bucket(max(h, w), bucket_multiple)
        padded = jnp.zeros((1, b, b, image.shape[3]), image.dtype)
        padded = jax.lax.dynamic_update_slice(padded, jnp.asarray(image),
                                              (0, 0, 0, 0))
        out = forward_bucketed(variables, padded,
                               jnp.asarray([h, w], jnp.int32), b)
        out = dict(out)
        out["ins_map"] = out["ins_map"][:h, :w]
        return out

    fwd._jitted = (forward_exact, forward_bucketed)  # test hook
    return fwd


def pick_bucket(m: int, multiple: int) -> int:
    """Round up to the next multiple (the bucket size for dimension m)."""
    return -(-m // multiple) * multiple


def mask_pad_region(seg_prob: jnp.ndarray, center: jnp.ndarray,
                    offset: jnp.ndarray, valid_hw: jnp.ndarray):
    """Force the pad region to pure background: it can then contribute no
    centers, no foreground pixels, and no instance-score mass, making the
    extraction invariant to the padding (tests/test_eval_buckets.py)."""
    H, W = seg_prob.shape[0], seg_prob.shape[1]
    m = ((jnp.arange(H)[:, None] < valid_hw[0]) &
         (jnp.arange(W)[None, :] < valid_hw[1]))
    bg = jnp.zeros_like(seg_prob).at[..., 0].set(1.0)
    seg_prob = jnp.where(m[..., None], seg_prob, bg)
    center = center * m[..., None]
    offset = offset * m[..., None]
    return seg_prob, center, offset


def validate_instances(forward: Callable,
                       samples: Iterable[Dict[str, np.ndarray]],
                       offset_scale: bool = True) -> Dict:
    """samples yield dicts: image (1,H,W,3), gt_masks (K,H,W) bool,
    gt_labels (K,) 0-based thing classes. Returns AP results dict."""
    acc = InstanceAPAccumulator()
    truncated = 0
    for s in samples:
        target_size = s["gt_masks"].shape[1:]
        out = forward(jnp.asarray(s["image"]), target_size)
        ins_map = np.asarray(out["ins_map"])
        truncated += int(out.get("truncated", 0))
        valid = np.asarray(out["valid"])
        labels = np.asarray(out["label"])[valid]
        scores = np.asarray(out["score"])[valid]
        slot_ids = np.nonzero(valid)[0]
        if len(slot_ids) == 0:
            labels = np.array([0])
            scores = np.array([0.0])
            iou = np.zeros((1, len(s["gt_masks"])))
        else:
            iou = ins_map_iou(ins_map, slot_ids, s["gt_masks"])
        acc.add_image(s["gt_labels"], s["gt_masks"], labels, scores, iou)
    acc.synch()   # merge per-process shards (no-op single-process)
    res = acc.results()
    # slot-cap saturation across the epoch: candidates dropped vs the
    # reference's unbounded center lists (0 on all of VOC val in practice)
    res["truncated_centers"] = truncated
    return res


def validate_semseg(classify: Callable,
                    samples: Iterable[Dict[str, np.ndarray]],
                    n_classes: int,
                    old_classes: Optional[int] = None) -> Dict:
    """classify: image (B,H,W,3) -> class probabilities (B,H,W,C).
    When `old_classes` is given (phase-1 pseudolabeler eval), GT labels below
    it are zeroed (``train.py:735-736``)."""
    metrics = StreamSegMetrics(n_classes)
    for s in samples:
        probs = np.asarray(classify(jnp.asarray(s["image"])))
        pred = probs.argmax(-1)
        labels = np.asarray(s["seg"]).copy()
        if labels.ndim == pred.ndim - 1:
            labels = labels[None]
        if old_classes is not None:
            labels[labels < old_classes] = 0
        metrics.update(labels, pred)
    metrics.synch()
    return metrics.get_results()
