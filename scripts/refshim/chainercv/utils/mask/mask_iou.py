from cl4wsis_tpu.metrics.voc_ap import mask_iou  # noqa: F401
