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


# ---------------------------------------------------------------------------
# Beyond-reference extensions: 2-D (data x model) meshes
# ---------------------------------------------------------------------------
# The reference has no TP/SP of any kind (SURVEY.md §2.9); these helpers are
# the TPU-native extension story: a ("data", "model") mesh where
#   * TP: conv kernels are sharded over OUTPUT channels on "model" — the
#     XLA SPMD partitioner keeps channel-parallel convs local and inserts
#     all-gathers only where channels mix across the sharding;
#   * SP: activations are sharded over the image H axis — XLA inserts the
#     conv halo exchanges automatically, which is the right spatial story
#     for 1Mpx-scale inputs (720x1280) that don't fit one chip's HBM at
#     large batch.
# Semantically every such placement is a no-op (SPMD preserves the math);
# tests assert sharded == single-device losses, and __graft_entry__'s
# dryrun compiles + executes all of them on an n-device mesh.


def make_mesh_2d(
    dp: int, tp: int, devices: Optional[Sequence] = None
) -> Mesh:
    """("data", "model") mesh of shape (dp, tp)."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, (dp, tp, len(devices))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def channel_shard_params(mesh: Mesh, tree, axis_name: str = "model"):
    """Shard conv kernels over output channels (last axis) and 1-D channel
    vectors (biases / BN stats) over the same axis when divisible;
    everything else replicated. Returns the tree placed on the mesh."""
    tp = mesh.shape[axis_name]

    def place(x):
        shape = getattr(x, "shape", ())
        if len(shape) == 4 and shape[-1] % tp == 0:
            spec = P(None, None, None, axis_name)
        elif len(shape) == 1 and shape[0] % tp == 0:
            spec = P(axis_name)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def dp_tp_shardings(mesh: Mesh):
    """(batch_sharding, replicated) for a 2-D mesh: the batch is sharded
    over "data" only; use channel_shard_params for the parameter tree."""
    return (
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
    )


def spatial_sharding(mesh: Mesh, h_axis: int = 3, ndim: int = 6,
                     axis_name: str = "model") -> NamedSharding:
    """Sharding for (B, Tl, Tm, H, W, C) event tensors with the batch over
    "data" and the image H axis over "model" (sequence/spatial
    parallelism; XLA adds conv halo exchanges)."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[h_axis] = axis_name
    return NamedSharding(mesh, P(*spec))
