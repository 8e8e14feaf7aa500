"""Device mesh and sharding for data-parallel training/inference over ICI.

The reference's distributed substrate is NCCL DistributedDataParallel plus a
manual per-rank Subset split at inference (SURVEY.md §2.4). TPU-natively the
whole thing is one `Mesh` with a `data` axis: the batch is sharded over it,
parameters are replicated, and XLA inserts the gradient all-reduce (psum over
ICI) automatically because the loss is a global reduction over a sharded
batch. There is no rank bookkeeping and — unlike the reference, whose
inference metrics are never all-reduced (tools/infer_lam.py:166-167) — the
confusion matrix is accumulated on device and is globally correct for free.

Model size (~150M frozen + ~5M trainable) makes TP/PP unnecessary
(SURVEY.md §2.4); scale comes from the batch axis.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(batch_size: int, devices=None,
                        axis: str = DATA_AXIS) -> Mesh:
    """Mesh over the most devices whose count divides the batch size."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    while batch_size % n:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis,))


def make_mesh_for_batch_multihost(per_process_batch: int,
                                  axis: str = DATA_AXIS) -> Mesh:
    """Multi-host analogue of make_mesh_for_batch: every host contributes
    the same number of devices, trimmed to the largest count dividing the
    PER-PROCESS batch — so `shard_local_batch` rows always map onto each
    host's own mesh devices."""
    per_host: dict[int, list] = {}
    for d in jax.devices():
        per_host.setdefault(d.process_index, []).append(d)
    k = min(len(v) for v in per_host.values())
    while per_process_batch % k:
        k -= 1
    devs = [d for pi in sorted(per_host) for d in per_host[pi][:k]]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every leaf over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Host arrays [B, ...] -> device arrays sharded over the data axis.

    B must divide by mesh size; the data pipeline pads eval remainders with
    a weight-0 mask (data/loader.py) so this always holds. Single-process
    only (every device addressable); multi-host feeds use
    `shard_local_batch`.
    """
    sharding = batch_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_local_batch(local_batch: Any, mesh: Mesh) -> Any:
    """Per-process local rows [B_local, ...] -> GLOBAL arrays [B_global, ...]
    sharded over the data axis.

    The multi-host analogue of the reference's DistributedSampler
    (scripts/train_voc.py:148): each process contributes the rows of its own
    loader shard (data/loader process_index/process_count args); the global
    batch is their concatenation in process order. Works single-process too
    (local == global)."""
    sharding = batch_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf over the mesh. Multi-host safe: when the mesh
    spans non-addressable devices, leaves are assembled per-process from the
    (identical) host value instead of device_put (which requires full
    addressability)."""
    sharding = replicated(mesh)
    if len(mesh.devices.flat) == len(
            [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def pad_to_multiple(batch: Any, multiple: int) -> tuple[Any, np.ndarray]:
    """Pad every leaf's batch dim up to a multiple; returns (batch, valid).

    `valid` is a host bool mask marking real rows — eval code weights padded
    rows to zero so sharded remainders stay exact (fixes the reference's
    drop-nothing-but-never-reduce inference sharding).
    """
    leaves = jax.tree_util.tree_leaves(batch)
    b = leaves[0].shape[0]
    pad = (-b) % multiple
    valid = np.concatenate([np.ones(b, bool), np.zeros(pad, bool)])
    if pad == 0:
        return batch, valid
    padded = jax.tree_util.tree_map(
        lambda x: np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]), batch)
    return padded, valid
