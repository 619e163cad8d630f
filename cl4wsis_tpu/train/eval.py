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
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.metrics.stream import StreamSegMetrics
from cl4wsis_tpu.metrics.voc_ap import InstanceAPAccumulator, ins_map_iou
from cl4wsis_tpu.ops.instance_postproc import get_ins_map
from cl4wsis_tpu.ops.resize import resize_bilinear


def make_eval_forward(model, variables, num_classes: int, val_flip: bool = False,
                      val_thresh: float = 0.1, val_kernel: int = 41,
                      beta: float = 3.0) -> Callable:
    """Jitted: image (1,H,W,3) -> instance slots at `target_size`.

    `variables` is passed as a jit argument (NOT closed over) so the params
    stay device buffers instead of being baked into the program as
    constants."""

    @partial(jax.jit, static_argnames=("target_size",))
    def forward(variables, image, target_size):
        imgs = jnp.concatenate([image, jnp.flip(image, axis=2)], axis=0) \
            if val_flip else image
        pred, _ = model.apply(variables, imgs, train=False, interpolate=False)
        pred = {k: resize_bilinear(v, target_size, align_corners=False)
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
        return get_ins_map(seg_prob, center, offset, num_classes=num_classes,
                           val_thresh=val_thresh, val_kernel=val_kernel,
                           beta=beta)

    def fwd(image, target_size):
        return forward(variables, image, target_size)

    return fwd


def validate_instances(forward: Callable,
                       samples: Iterable[Dict[str, np.ndarray]],
                       offset_scale: bool = True) -> Dict:
    """samples yield dicts: image (1,H,W,3), gt_masks (K,H,W) bool,
    gt_labels (K,) 0-based thing classes. Returns AP results dict."""
    acc = InstanceAPAccumulator()
    for s in samples:
        target_size = s["gt_masks"].shape[1:]
        out = forward(jnp.asarray(s["image"]), target_size)
        ins_map = np.asarray(out["ins_map"])
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
    return acc.results()


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
