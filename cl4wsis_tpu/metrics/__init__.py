from cl4wsis_tpu.metrics.stream import StreamSegMetrics
from cl4wsis_tpu.metrics.voc_ap import InstanceAPAccumulator, ins_map_iou, mask_iou

__all__ = ["StreamSegMetrics", "InstanceAPAccumulator", "ins_map_iou", "mask_iou"]
