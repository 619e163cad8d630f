from cl4wsis_tpu.utils.logging import Logger, StepTimer
from cl4wsis_tpu.utils.visualize import Label2Color, denorm, voc_cmap

__all__ = ["Logger", "StepTimer", "Label2Color", "denorm", "voc_cmap"]
