"""Model assembly: backbone + DeepLab-v3 seg branch + instance branch.

Re-design of reference ``segmentation_module.py:61-97,289-451``. One flax
module with several apply methods mirrors the reference's forward variants:

* ``__call__``        — full forward: seg logits + center/offset (+ features)
* ``forward_seg``     — semantic branch only (phase-2 frozen TTA pass)
* ``forward_features``— backbone only (feature extractor)
* ``forward_instance``— instance decoder+head on given backbone features
                        (phase-2 trains only this path on detached features)

The main reference path always uses DeepLab-v3 as the semantic branch and
'ins' as the panoptic branch (``argparser.py:19-24``); phase 1 uses branch
'none' (no instance decoder parameters at all).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cl4wsis_tpu.models.deeplab import DeepLabV3Head, IncrementalClassifier
from cl4wsis_tpu.models.panoptic import IncrementalInstanceHead, PanopticDecoder
from cl4wsis_tpu.models.resnet import ResNet
from cl4wsis_tpu.ops.resize import resize_bilinear


# structure, bottleneck? — mirrors reference models/resnet.py:126-138
_RESNET_STRUCTURES = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}


def backbone_channels(backbone: str) -> int:
    if "wide" in backbone:
        return 4096
    if backbone in _RESNET_STRUCTURES and not _RESNET_STRUCTURES[backbone][1]:
        return 512  # basic-block nets (18/34)
    return 2048


class CL4WSISModel(nn.Module):
    """Incremental instance segmentation model (the reference's
    IncrementalInstanceSegmentationModule, ``segmentation_module.py:289``).

    Attributes:
      classes: per-step class counts, e.g. (16, 5) for VOC 15-5 step 1.
      backbone: 'resnet101' | 'resnet50' | 'wider_resnet38_a2'.
      has_instance: build the instance decoder+head (branch == 'ins').
      detach_instance: stop gradients from the instance branch into the
        backbone (auto-on for weakly-supervised incremental steps).
      pooling_size: eval-time ASPP pooling window = crop // output_stride.
    """

    classes: Sequence[int]
    backbone: str = "resnet101"
    output_stride: int = 16
    pooling_size: Optional[int] = 32
    has_instance: bool = True
    detach_instance: bool = False
    dtype: Any = None
    norm_act: str = "iabn_sync"
    remat: bool = False  # rematerialize backbone blocks (memory for FLOPs)
    # test hook: override the ResNet block counts (e.g. (1,1,1,1) for tiny nets)
    backbone_structure: Optional[Sequence[int]] = None

    @property
    def tot_classes(self) -> int:
        return sum(self.classes)

    def setup(self):
        from cl4wsis_tpu.core.norms import norm_factory
        norm = norm_factory(self.norm_act)
        if self.backbone in _RESNET_STRUCTURES:
            default_structure, bottleneck = _RESNET_STRUCTURES[self.backbone]
            structure = self.backbone_structure or default_structure
            self.body = ResNet(structure=tuple(structure), bottleneck=bottleneck,
                               output_stride=self.output_stride,
                               norm=norm, dtype=self.dtype, remat=self.remat)
        elif self.backbone == "wider_resnet38_a2":
            from cl4wsis_tpu.models.wide_resnet import WiderResNet38A2
            self.body = WiderResNet38A2(output_stride=self.output_stride,
                                        norm=norm, dtype=self.dtype,
                                        remat=self.remat)
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")

        self.seg_head = DeepLabV3Head(
            in_channels=backbone_channels(self.backbone), out_channels=256,
            hidden_channels=256, out_stride=self.output_stride,
            pooling_size=self.pooling_size, norm=norm, dtype=self.dtype)
        self.cls = IncrementalClassifier(classes=tuple(self.classes), dtype=self.dtype)

        if self.has_instance:
            self.instance_decoder = PanopticDecoder(
                decoder_channels=128, aspp_channels=256,
                low_level_project=(64, 32, 16), dtype=self.dtype)
            center_classes = list(self.classes)
            center_classes[0] -= 1  # background has no center channel
            self.instance_head = IncrementalInstanceHead(
                center_classes=tuple(center_classes), dtype=self.dtype)

    # ---- apply methods -------------------------------------------------

    def forward_features(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        return self.body(x, train=train)

    def forward_instance(self, features: Dict[str, jnp.ndarray],
                         train: bool = False) -> Dict[str, jnp.ndarray]:
        dec = self.instance_decoder(features, train=train)
        return self.instance_head(dec, train=train)

    def _seg_logits(self, features: Dict[str, jnp.ndarray], train: bool) -> jnp.ndarray:
        x_pl = self.seg_head(features["res5"], train=train)
        return self.cls(x_pl)

    def forward_seg(self, x: jnp.ndarray, train: bool = False, interpolate: bool = True
                    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        features = self.body(x, train=train)
        pred = {"seg": self._seg_logits(features, train)}
        if interpolate:
            pred = _upsample(pred, x.shape[1:3])
        return pred, {"body": features["res5"], "features": features}

    def __call__(self, x: jnp.ndarray, train: bool = False, interpolate: bool = True,
                 as_feature_extractor: bool = False):
        features = self.body(x, train=train)
        if as_feature_extractor:
            return {"body": features["res5"], "features": features}
        pred = {"seg": self._seg_logits(features, train)}
        if self.has_instance:
            ins_feats = (jax.tree_util.tree_map(jax.lax.stop_gradient, features)
                         if self.detach_instance else features)
            pred.update(self.forward_instance(ins_feats, train=train))
        if interpolate:
            pred = _upsample(pred, x.shape[1:3])
        return pred, {"body": features["res5"], "features": features}


def _upsample(pred: Dict[str, jnp.ndarray], size) -> Dict[str, jnp.ndarray]:
    # reference upsamples final predictions with align_corners=True
    # (segmentation_module.py:428-440)
    return {k: resize_bilinear(v, tuple(size), align_corners=True) for k, v in pred.items()}


def make_model(classes: Sequence[int], backbone: str = "resnet101",
               output_stride: int = 16, crop_size: int = 512,
               branch: str = "ins", detach_instance: bool = False,
               dtype: Any = None, norm_act: str = "iabn_sync",
               remat: bool = False,
               backbone_structure: Optional[Sequence[int]] = None) -> CL4WSISModel:
    """Factory mirroring reference ``make_model`` (segmentation_module.py:61)."""
    return CL4WSISModel(
        classes=tuple(classes), backbone=backbone, output_stride=output_stride,
        pooling_size=crop_size // output_stride,
        has_instance=(branch == "ins"), detach_instance=detach_instance,
        dtype=dtype, norm_act=norm_act, remat=remat,
        backbone_structure=backbone_structure)
