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


def make_local_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data mesh over THIS PROCESS's devices only.

    The samplers (sample_g/sample_r) shard work by SEGMENT across processes
    (resolve_shard striding — the reference's independent worker processes,
    script/sample.py / sample_refine.py): each process runs its own batches
    through its own jit, so its mesh must span only addressable devices. A
    global mesh there would deadlock — a multi-process SPMD program requires
    every process to execute the same computation on the same global arrays,
    and the sampler processes intentionally feed different data."""
    return make_mesh(n_devices, devices=jax.local_devices())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded on the leading axis.

    Single-process: a plain device_put. Multi-process: each host's loader
    yields its OWN stripe of the data (DataLoader strides by process_index —
    DistributedSampler semantics, reference launch/train.py:394-432), so the
    per-host batch is this host's SHARD of a global batch of
    process_count * batch_size rows; `make_array_from_process_local_data`
    assembles the global array from the per-host shards. A plain device_put
    would be wrong twice over: jax asserts value-equality across processes
    for non-addressable shardings (verified: it raises "passed to device_put
    is not the same on each process" under a 2-process CPU mesh), and even
    without the check each host's rows outside its addressable slice would be
    silently dropped. The 1-D mesh orders devices process-major
    (jax.devices()), so host w's contiguous local rows land at global rows
    [w*bs, (w+1)*bs) — exactly its addressable shards when bs divides evenly
    by local device count."""
    s = batch_sharding(mesh)
    if s.is_fully_addressable:  # single-process, or a make_local_mesh sampler
        return jax.tree.map(lambda a: jax.device_put(a, s), batch)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(s, np.asarray(a)), batch
    )


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, r), tree)


def is_coordinator() -> bool:
    """Rank-0 gate for I/O side effects (ckpt writes, logging)."""
    return jax.process_index() == 0
