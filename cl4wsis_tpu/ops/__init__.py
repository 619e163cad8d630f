from cl4wsis_tpu.ops.resize import resize_bilinear

__all__ = ["resize_bilinear"]
