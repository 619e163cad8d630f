from cl4wsis_tpu.data.loader import Loader, eval_samples
from cl4wsis_tpu.data.synthetic import synthetic_batches
from cl4wsis_tpu.data.voc import make_voc_datasets

__all__ = ["Loader", "eval_samples", "synthetic_batches", "make_voc_datasets"]
