from cl4wsis_tpu.core.abn import ABN
from cl4wsis_tpu.core.mesh import create_mesh, shard_batch, replicate

__all__ = ["ABN", "create_mesh", "shard_batch", "replicate"]
