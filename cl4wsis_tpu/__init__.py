"""cl4wsis_tpu: TPU-native continual-learning weakly-supervised instance segmentation.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
AI-Application-and-Integration-Lab/CL4WSIS (ICCV 2023): a three-stage pipeline
(supervised base step, CL-WSSS phase 1, CL4WSIS phase 2) for class-incremental
instance segmentation from image-level weak supervision.

Layer map (see SURVEY.md for the reference analysis this is built to):
  core/    mesh + sharding, fused sync-ABN (BN + leaky-ReLU) incl. Pallas kernel
  ops/     device-side label factory: connected components, peaks, centers,
           pixel grouping, PAMR affinity, instance post-processing
  models/  flax ResNet-101 / WideResNet-38 backbones, DeepLab-v3 head,
           Panoptic-DeepLab decoder, incremental classifiers, model assembly
  wss/     weak-supervision machinery: PseudoLabeler, PeakGenerator,
           pseudo_gtmask, balanced mask losses, ngwp/bce/randrop losses
  cl/      continual-learning task registry, checkpoint expansion, old-model apply
  data/    host input pipeline: VOC/SBD, COCO, transforms, GT label generation
  train/   per-phase jitted train steps, losses, schedules, trainer loop, eval
  metrics/ streaming confusion matrix, VOC-protocol instance AP
  cli/     flag-compatible entry point
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax at package import)."""
    if name == "Predictor":
        from cl4wsis_tpu.serve import Predictor
        return Predictor
    if name == "make_model":
        from cl4wsis_tpu.models import make_model
        return make_model
    if name == "tasks":
        from cl4wsis_tpu.cl import tasks
        return tasks
    raise AttributeError(name)
