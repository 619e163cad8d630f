from cl4wsis_tpu.cl import tasks

__all__ = ["tasks"]
