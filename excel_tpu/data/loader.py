"""Batching and prefetch: host pipeline feeding the TPU at line rate.

The reference uses torch DataLoader with 10 fork workers per rank
(scripts/train_voc.py:148-165). Here: an N-worker thread pool (threads, not
processes — PIL decode and numpy release the GIL) producing fixed-shape
uint8 numpy batches in order; normalization happens on device.

Determinism: the index stream comes from one seed-shared permutation
sequence, and every sample's augmentation RNG is derived from
(seed, step, slot) rather than consumed from a shared generator — so the
batch stream is IDENTICAL for any worker count, and under multi-host
sharding each process draws its own rows of the same global permutation
(process p takes rows [p*B, (p+1)*B) of each global batch — the
concatenation order `parallel.shard_local_batch` assembles).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def _stack(samples: list[dict], keys: tuple[str, ...]) -> dict:
    out = {}
    for k in keys:
        vals = [s[k] for s in samples]
        out[k] = (np.stack(vals) if isinstance(vals[0], np.ndarray)
                  else np.asarray(vals)) if k != "name" else vals
    return out


def _index_stream(dataset_len: int, global_batch: int, seed: int):
    """Infinite deterministic stream of global-batch index lists.

    Epoch reshuffle replicates DistributedSampler.set_epoch semantics; the
    reference's bare except/restart idiom (train_voc.py:174-178) is
    unnecessary — the stream never ends. Leftover indices carry across epoch
    boundaries so every batch is full even when the batch size doesn't
    divide (or exceeds) the dataset size.
    """
    rng = np.random.default_rng(seed)
    pool: list[int] = []
    while True:
        while len(pool) < global_batch:
            pool.extend(rng.permutation(dataset_len).tolist())
        idxs, pool[:] = pool[:global_batch], pool[global_batch:]
        yield idxs


def train_batches(dataset, batch_size: int, seed: int = 0,
                  keys=("name", "image", "cls_label", "img_box", "label"),
                  prefetch: int = 2, num_workers: int = 1,
                  process_index: int = 0,
                  process_count: int = 1) -> Iterator[dict]:
    """Infinite shuffled batch stream with an N-worker decode/augment pool.

    batch_size is PER PROCESS; the global batch is batch_size*process_count
    and process p materializes rows [p*B, (p+1)*B) of it (the reference's
    DistributedSampler sharding, scripts/train_voc.py:148). The yielded
    stream is bit-identical for every (num_workers, prefetch) choice.
    """
    gb = batch_size * process_count
    lo = process_index * batch_size

    def load_batch(step_idxs):
        step, idxs = step_idxs
        local = idxs[lo:lo + batch_size]
        samples = []
        for slot, i in enumerate(local):
            rng = np.random.default_rng((seed, step, lo + slot))
            samples.append(dataset.__getitem__(int(i), rng=rng))
        return _stack(samples, keys)

    stream = enumerate(_index_stream(len(dataset), gb, seed))
    yield from _ordered_pool_map(load_batch, stream, max(1, num_workers),
                                 prefetch)


def _ordered_pool_map(fn, it, workers: int, lookahead: int):
    """Lazy ordered thread-pool map over a (possibly infinite) iterator.

    Unlike Executor.map — which drains the whole input iterable eagerly —
    this keeps at most workers+lookahead tasks in flight, submitting one as
    each result is consumed. Results arrive strictly in input order."""
    import collections
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=workers)
    pending: collections.deque = collections.deque()
    it = iter(it)

    def submit_next() -> bool:
        try:
            pending.append(ex.submit(fn, next(it)))
            return True
        except StopIteration:
            return False

    try:
        for _ in range(workers + lookahead):
            if not submit_next():
                break
        while pending:
            out = pending.popleft().result()
            submit_next()
            yield out
    finally:
        try:
            ex.shutdown(wait=False, cancel_futures=True)
        except BaseException:
            # interpreter teardown may have already torn down the queue
            # module this touches; nothing left to clean up then
            pass


def eval_samples(dataset) -> Iterator[dict]:
    """Sequential full-size eval samples (batch-1 protocols)."""
    for i in range(len(dataset)):
        yield dataset[i]


def prefetch_iter(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` in a background thread, `depth` items ahead — overlaps host
    decode/resize with device compute in the eval sweeps."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(done)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            return
        yield item
