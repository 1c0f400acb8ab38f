"""Device-mesh helpers: the TPU-native replacement for the reference's DDP
process topology (reference: yolox/core/launch.py:39-147, utils/dist.py).

Parallelism model (SURVEY.md §2.9): the reference is data-parallel only.
Here DP is a 1-D ``data`` mesh axis over all chips: the batch is sharded on
axis 0, parameters are replicated, and XLA inserts the gradient all-reduce
over ICI when the jitted train step consumes sharded inputs. Multi-host init
goes through ``jax.distributed.initialize`` (DCN rendezvous) instead of a
TCP/NCCL process group.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_shardings",
    "initialize_distributed",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host rendezvous (replaces dist.init_process_group,
    reference core/launch.py:118-124). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    devices: Optional[Sequence] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_shardings(mesh: Mesh, axis_name: str = "data"):
    """(batch_sharding, replicated_sharding) for the train step."""
    return (
        NamedSharding(mesh, P(axis_name)),
        NamedSharding(mesh, P()),
    )


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a host batch with axis 0 sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
