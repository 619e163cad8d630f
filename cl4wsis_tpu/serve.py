"""Inference / serving API.

The reference has no deployment story (validation loops only); this module
provides one: load a checkpoint, get a `Predictor`, feed images, receive
per-instance (class, score, mask) plus the semantic map. Compiled programs
are cached per input-shape bucket so a serving process pays compilation once
per bucket; masks come back as compact slot-id maps and can be exported as
COCO-format results (RLE) for downstream tooling.

    predictor = Predictor.from_checkpoint("checkpoints/step/voc-15-5-ov/OURS_1",
                                          classes=(16, 5))
    result = predictor(image_uint8)          # HWC uint8 or float
    coco = result.to_coco(image_id=1)        # list of COCO result dicts
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from cl4wsis_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


@dataclasses.dataclass
class InstancePrediction:
    """One image's predictions."""

    ins_map: np.ndarray          # (H, W) int32 slot id, -1 = background
    labels: np.ndarray           # (S,) 0-based thing class per slot
    scores: np.ndarray           # (S,)
    valid: np.ndarray            # (S,) bool
    seg: np.ndarray              # (H, W) semantic argmax (0 = background)

    def instances(self) -> List[Dict[str, Any]]:
        out = []
        for s in np.nonzero(self.valid)[0]:
            mask = self.ins_map == s
            if mask.any():
                out.append({"label": int(self.labels[s]),
                            "score": float(self.scores[s]), "mask": mask})
        return out

    def to_coco(self, image_id: int, category_ids: Optional[Sequence[int]] = None
                ) -> List[Dict[str, Any]]:
        """COCO-format results (uncompressed RLE segmentations)."""
        from cl4wsis_tpu.data.maskrle import rle_encode
        res = []
        for inst in self.instances():
            cat = (category_ids[inst["label"]] if category_ids is not None
                   else inst["label"] + 1)
            res.append({"image_id": image_id, "category_id": int(cat),
                        "score": inst["score"],
                        "segmentation": rle_encode(inst["mask"].astype(np.uint8))})
        return res


class Predictor:
    """Shape-bucketed jitted inference over a trained model."""

    def __init__(self, model, variables, *, val_thresh: float = 0.1,
                 val_kernel: int = 41, beta: float = 3.0,
                 val_flip: bool = False, bucket_multiple: int = 64,
                 size_buckets: Optional[Sequence[int]] = None):
        import jax

        self.model = model
        self.variables = jax.device_put(variables)
        self.n_things = model.tot_classes - 1
        # back-compat: a size_buckets list collapses to its granularity
        if size_buckets:
            bucket_multiple = int(min(size_buckets))
        self.bucket_multiple = bucket_multiple
        self._fns: Dict[str, Any] = {}
        self.val_thresh = val_thresh
        self.val_kernel = val_kernel
        self.beta = beta
        self.val_flip = val_flip

    @classmethod
    def from_checkpoint(cls, path: str, classes: Sequence[int],
                        backbone: str = "resnet101", output_stride: int = 16,
                        crop_size: int = 512, dtype: str = "bfloat16",
                        **kw) -> "Predictor":
        import jax.numpy as jnp

        from cl4wsis_tpu.cl.ckpt import load_checkpoint
        from cl4wsis_tpu.models import make_model

        blob = load_checkpoint(path)
        variables = {"params": blob["state"]["params"]["model"],
                     "batch_stats": blob["state"]["batch_stats"]["model"]}
        model = make_model(classes, backbone, output_stride, crop_size,
                           dtype={"bfloat16": jnp.bfloat16,
                                  "float32": jnp.float32}[dtype])
        return cls(model, variables, **kw)

    def _fn(self):
        if self._fns.get("fwd") is None:
            from cl4wsis_tpu.train.eval import make_eval_forward
            # the shared bucketed eval path pads to a bucket, masks the pad
            # region to background (no spurious pad instances), and crops
            self._fns["fwd"] = make_eval_forward(
                self.model, self.variables, self.n_things,
                val_flip=self.val_flip, val_thresh=self.val_thresh,
                val_kernel=self.val_kernel, beta=self.beta,
                bucket_multiple=self.bucket_multiple)
        return self._fns["fwd"]

    def __call__(self, image: np.ndarray) -> InstancePrediction:
        """image: (H, W, 3) uint8 or float in [0,1] or pre-normalized."""
        import jax.numpy as jnp

        h, w = image.shape[:2]
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        if image.max() > 4.0:  # heuristics: not yet normalized
            image = image / 255.0
        if image.min() >= 0.0:  # normalize if still in [0,1]
            image = (image - IMAGENET_MEAN) / IMAGENET_STD

        out = self._fn()(jnp.asarray(image[None], jnp.float32), (h, w))
        ins = np.asarray(out["ins_map"])
        # semantic map from the instance labels (slot -> class + 1)
        labels = np.asarray(out["label"])
        seg = np.where(ins >= 0, labels[np.clip(ins, 0, None)] + 1, 0)
        return InstancePrediction(
            ins_map=ins, labels=labels, scores=np.asarray(out["score"]),
            valid=np.asarray(out["valid"]), seg=seg.astype(np.int32))
