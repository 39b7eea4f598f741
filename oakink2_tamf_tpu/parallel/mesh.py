"""Device mesh + sharding helpers.

TPU-native replacement for the reference's parallelism surface (SURVEY §2.4):
torch DDP over NCCL with a localhost rendezvous (util/ddp_util.py:16-21,
single-node only) becomes a 1-D data mesh under GSPMD — the gradient
all-reduce is fused into the pjit-compiled train step, and the same code runs
single-chip, multi-chip (ICI) or multi-host (DCN) by constructing a bigger mesh.

`process_index() == 0` replaces the reference's rank-0 gating.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded on the leading axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, r), tree)


def is_coordinator() -> bool:
    """Rank-0 gate for I/O side effects (ckpt writes, logging)."""
    return jax.process_index() == 0
