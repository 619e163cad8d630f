from cl4wsis_tpu.metrics.voc_ap import _voc_ap


def calc_detection_voc_ap(prec, rec, use_07_metric=False):
    return _voc_ap(prec, rec, use_07_metric=use_07_metric)
