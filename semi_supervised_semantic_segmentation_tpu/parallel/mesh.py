"""Device mesh + sharding rules (rebuilds C23/N3: the reference's
NCCL/DDP surface becomes XLA ICI collectives under GSPMD).

Strategy (SURVEY §2.3): pure data parallelism on a ('data', 'model') mesh
with model=1 reserved.  Batches shard on 'data'; params/optimizer state are
replicated.  Under jit, XLA's SPMD partitioner inserts the psum/all-reduce
for gradient sync and for cross-replica BatchNorm statistics automatically —
there is no hand-written collective in the train step, which is exactly the
TPU-native shape of DDP+SyncBN.  Multi-host: the same mesh spans hosts after
``jax.distributed.initialize()``; ICI carries in-slice traffic, DCN carries
cross-slice.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data_parallel == -1:
        data_parallel = len(devices) // model_parallel
    n = data_parallel * model_parallel
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} visible"
        )
    grid = np.asarray(devices[:n]).reshape(data_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis on 'data'; spatial/channel replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with the batch axis sharded on 'data'.

    Single process: a plain sharded device_put.  Multi-host: each process
    holds its contiguous row-block of the global batch (see
    data.pipeline.Loader process slicing) and the blocks assemble into one
    global jax.Array — the TPU-native DistributedSampler."""
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
        )
    nproc = jax.process_count()

    def put(x):
        global_shape = (x.shape[0] * nproc,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, x.ndim), x, global_shape
        )

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def batch_shardings_like(batch: Any, mesh: Mesh) -> Any:
    """A pytree of NamedShardings matching ``batch`` (for jit in_shardings)."""
    return jax.tree.map(lambda x: batch_sharding(mesh, x.ndim), batch)


def replicated_shardings_like(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda _: sh, tree)
