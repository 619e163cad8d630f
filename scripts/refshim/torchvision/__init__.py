"""Minimal torchvision shim for running the reference on this host.

Surface (enumerated from the reference's imports): ``transforms.functional``
(resize, pad, crop, center_crop, resized_crop, hflip, vflip, rotate,
to_tensor, normalize, adjust_{brightness,contrast,saturation,hue}),
``transforms.InterpolationMode``, and ``datasets.coco.CocoDetection``
(dataset/voc.py:218). Original implementations over PIL + torch.
"""

from . import datasets, transforms  # noqa: F401

__version__ = "0.0.0+cl4wsis-shim"
