"""Device mesh + sharding helpers (L6 distributed runtime).

Reference mechanism: DDP/NCCL data parallelism (tools/train.py:176,
pcdet/utils/common_utils.py:169-211) with per-rank DistributedSampler batch
slicing and allreduce-in-backward.

TPU-native: one 1-D ``Mesh`` over all chips with axis "dp"; the global batch
is sharded on its leading axis, params/opt-state are replicated, and the
whole train step runs under ``jit`` with GSPMD shardings — XLA inserts the
gradient all-reduce (the DDP allreduce) and cross-replica BN reductions over
ICI automatically. Multi-host: `jax.distributed.initialize()` +
per-host dataloading feeding `jax.make_array_from_process_local_data`.

Note on BatchNorm: because batch statistics are computed over the *global*
(sharded) batch inside one jit, BN is synchronized across replicas — the
semantics of the reference's optional --sync_bn
(tools/train.py:144-145), on by default here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Device_put a host batch pytree with leading-axis sharding."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
