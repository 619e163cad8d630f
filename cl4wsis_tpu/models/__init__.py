from cl4wsis_tpu.models.assembly import CL4WSISModel, make_model
from cl4wsis_tpu.models.deeplab import DeepLabV3Head, IncrementalClassifier
from cl4wsis_tpu.models.panoptic import ASPP, IncrementalInstanceHead, PanopticDecoder
from cl4wsis_tpu.models.resnet import (ResNet, resnet18, resnet34, resnet50,
                                       resnet101, resnet152)

__all__ = [
    "CL4WSISModel", "make_model", "DeepLabV3Head", "IncrementalClassifier",
    "ASPP", "IncrementalInstanceHead", "PanopticDecoder", "ResNet",
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
]
