"""chainercv shim: the reference uses only ``evaluations.calc_detection_voc_ap``
(metrics/voc_evaluation.py:7) and ``utils.mask.mask_iou.mask_iou``
(train.py:30). Both delegate to the rebuild's own implementations
(cl4wsis_tpu/metrics/voc_ap.py), which were written against the published
VOC-AP definition."""
