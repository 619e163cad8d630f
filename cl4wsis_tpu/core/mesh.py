"""Device mesh + sharding helpers.

The reference distributes with one process per GPU and NCCL DDP
(reference ``run.py:38-41``, ``train.py:187-196``). The TPU-native design is
SPMD: one 1-D ``data`` mesh over all chips, batches sharded on their leading
axis, parameters replicated. Gradient all-reduce, the cross-replica
batch-norm statistics sync that InPlaceABNSync did per layer
(``segmentation_module.py:18-19``), and metric reductions all become XLA
collectives inserted by ``jit`` from the sharding annotations — no backend
code, no rendezvous (``get_free_port.py`` has no analogue here).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a host batch pytree with the leading axis sharded over `mesh`.

    Multi-process: each process passes its LOCAL shard (what its Loader
    yielded); the global batch is their concatenation over the process-ordered
    mesh (``jax.make_array_from_process_local_data``) — the SPMD equivalent of
    the reference's per-rank DataLoader batches (``run.py:72-77``)."""
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over `mesh` (params, opt state).

    Multi-process: every process holds the identical full value (same-seed
    init or a checkpoint read from shared storage), so the replicated global
    array is assembled from process-local data."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
