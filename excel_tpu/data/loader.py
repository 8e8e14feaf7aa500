"""Batching and prefetch: host pipeline feeding the TPU at line rate.

The reference uses torch DataLoader with 10 fork workers per rank
(scripts/train_voc.py:148-165). Here: a thread-based double-buffered
prefetcher (decode/augment overlap device compute; threads, not processes —
PIL decode releases the GIL and this host is single-core anyway) producing
fixed-shape uint8 numpy batches; normalization happens on device.
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


def train_batches(dataset, batch_size: int, seed: int = 0,
                  keys=("name", "image", "cls_label", "img_box", "label"),
                  prefetch: int = 2) -> Iterator[dict]:
    """Infinite shuffled batch stream with background prefetch.

    Epoch reshuffle replicates DistributedSampler.set_epoch semantics; the
    reference's bare except/restart idiom (train_voc.py:174-178) is
    unnecessary — the stream never ends.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        rng = np.random.default_rng(seed)
        pool: list[int] = []
        while not stop.is_set():
            # carry leftover indices across epoch boundaries so every batch
            # is full even when batch_size doesn't divide (or exceeds) the
            # dataset size
            while len(pool) < batch_size:
                pool.extend(rng.permutation(len(dataset)).tolist())
            idxs, pool[:] = pool[:batch_size], pool[batch_size:]
            samples = [dataset.__getitem__(int(i), rng=rng) for i in idxs]
            q.put(_stack(samples, keys))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()
        # unblock the worker if it is waiting on a full queue
        while not q.empty():
            q.get_nowait()


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
