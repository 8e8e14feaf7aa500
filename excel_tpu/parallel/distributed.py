"""Multi-host initialization (SURVEY.md §5.8).

Single-controller JAX: each host process calls `initialize()` once before
any jax op; afterwards `jax.devices()` spans every chip in the slice (ICI)
or across slices (DCN) and the data-axis `Mesh` from mesh.py covers all of
them. Gradient reduction and the streaming confusion matrix then operate
globally with no further code changes — unlike the reference, whose
inference metrics are computed per NCCL rank and never reduced
(tools/infer_lam.py:166-167).
"""
from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    With no arguments, relies on the TPU runtime's automatic discovery
    (GCE metadata / megascale env). Returns True if distributed mode is
    active, False for single-process runs (no-op, safe to call always).
    """
    multi = (coordinator_address is not None
             or os.environ.get("COORDINATOR_ADDRESS")
             or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
             or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if not multi:
        return False
    # explicit args win; else COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    # env (launcher-style config for non-TPU backends, e.g. the gloo CPU
    # tests); else None lets the TPU runtime auto-discover
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    # idempotent: drivers call initialize() too; a launcher (or a test
    # harness establishing the collectives context early) may have already
    # connected this process
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return True
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    return True


def is_primary() -> bool:
    """Rank-0 gating for logging/checkpoint writes (the reference's
    `if args.local_rank == 0`, scripts/train_voc.py:231,251)."""
    return jax.process_index() == 0


def global_sum_host(x):
    """Sum a host array across processes (no-op single-process).

    Used by the eval sweeps to reduce per-process confusion hists — the
    all-reduce the reference never does (its per-rank inference tables are
    simply printed unreduced, tools/infer_lam.py:166-167)."""
    import numpy as np
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.asarray(gathered).sum(axis=0)


def shard_dataset(dataset, process_index: int | None = None,
                  process_count: int | None = None):
    """Round-robin per-process view of an eval dataset (the reference's
    manual `Subset(range(rank, N, world))`, tools/infer_lam.py:166-167).
    Identity when single-process."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return dataset
    return _DatasetShard(dataset, pi, pc)


class _DatasetShard:
    def __init__(self, dataset, index: int, count: int):
        self._dataset = dataset
        self._idxs = list(range(index, len(dataset), count))

    def __len__(self):
        return len(self._idxs)

    def names(self) -> list[str]:
        base = self._dataset.names()
        return [base[i] for i in self._idxs]

    def __getitem__(self, i):
        return self._dataset[self._idxs[i]]
