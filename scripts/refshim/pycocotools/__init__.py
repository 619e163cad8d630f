"""pycocotools shim: delegates to the rebuild's exact-CRLE implementation
(cl4wsis_tpu/data/{cocojson,maskrle}.py). The reference touches only
``pycocotools.coco.COCO`` (dataset/coco.py:6 and, indirectly, the
torchvision CocoDetection base of dataset/voc.py:218)."""
