"""Host dense-CRF post-processing at dataset scale.

Reference protocol (tools/infer_seg_voc.py:90-91,103-174,
tools/infer_seg_coco.py:91-92,100-167, tools/infer_lam.py:116-120,179-237):
the sweep spills ONE npy per image — a pickled dict holding the pre-CRF
arrays — and a host pass streams the files back through the dense CRF,
argmaxes, and scores against the full-resolution ground truth.

This module is the tpu-native rebuild of that pass around the C++
permutohedral lattice (excel_tpu/crf.py). Differences from the reference's
joblib composition, each deliberate:

- BOUNDED memory: `joblib.Parallel(pre_dispatch="all")` materializes every
  job up front and holds every (pred, full-res label) pair until the final
  `zip(*results)` — ~30 GB of host RAM on COCO val. Here at most
  `2 x workers` images are in flight; each finished image folds into the
  [C, C] confusion hist immediately (numpy bincount, utils.update_hist_np)
  and is freed. Nothing in the tail dispatches a device program.
- threads, not processes: the lattice call releases the GIL (ctypes), so a
  thread pool delivers the same parallelism without fork/pickle overhead.
  Pool width keeps the reference sizing: 0.6 x cpu_count
  (tools/infer_seg_voc.py:164-165).
- image/label decode happens INSIDE the pooled job (the reference decodes
  there too) — the pool parallelizes JPEG decode alongside the lattice.

Multi-host: each process post-processes only the images its dataset shard
spilled; callers reduce the returned local hist with
`parallel.distributed.global_sum_host` before scoring (the all-reduce the
reference never does — its per-rank CRF tables print unreduced,
tools/infer_lam.py:166-167).
"""
from __future__ import annotations

import os

import numpy as np

from ..crf import DenseCRF
from ..data.resize import resize_bilinear
from ..utils.metrics import update_hist_np


def default_workers() -> int:
    """The reference's joblib pool sizing (tools/infer_seg_voc.py:164)."""
    return max(1, int((os.cpu_count() or 1) * 0.6))


def crf_from_cfg(crf_cfg) -> DenseCRF:
    """The eval-protocol parameter set (tools/infer_seg_voc.py:113-120 ==
    tools/infer_lam.py:189-196 — both CRF passes share it)."""
    return DenseCRF(iter_max=crf_cfg.iters, pos_w=crf_cfg.pos_w,
                    pos_xy_std=crf_cfg.pos_xy_std, bi_w=crf_cfg.bi_w,
                    bi_xy_std=crf_cfg.bi_xy_std, bi_rgb_std=crf_cfg.bi_rgb_std)


# ---------------------------------------------------------------------------
# sweep-side spillers (the save_logits / save_lam hooks)
# ---------------------------------------------------------------------------

def seg_logit_spiller(logits_dir: str, scale: float = 1.0):
    """-> save_logits(name, logits [C, h, w]) writing the reference's
    per-image npy dict ({"msc_seg": [1, C, h, w]}, infer_seg_voc.py:90-91).

    scale < 1 stores downscaled logits — the reference's COCO disk bound
    (infer_seg_coco.py:62-64 saves at 0.2 x label resolution; its crf pass
    bilinearly upsamples before the softmax). fp32, like the reference."""
    os.makedirs(logits_dir, exist_ok=True)

    def save(name: str, logits: np.ndarray) -> None:
        if scale != 1.0:
            c, h, w = logits.shape
            oh, ow = max(1, int(scale * h)), max(1, int(scale * w))
            logits = resize_bilinear(
                np.transpose(logits, (1, 2, 0)), (oh, ow)).transpose(2, 0, 1)
        np.save(os.path.join(logits_dir, name + ".npy"),
                {"msc_seg": np.asarray(logits, np.float32)[None]})

    return save


def lam_spiller(logits_dir: str):
    """-> save(name, valid_lam [1+K, h, w], keys [K]) writing the
    reference's LAM spill ({"valid_lam", "keys_gt"}, infer_lam.py:116-119):
    bg + the image's K present-class normed cams, plus their 0-based
    foreground class indices."""
    os.makedirs(logits_dir, exist_ok=True)

    def save(name: str, valid_lam: np.ndarray, keys: np.ndarray) -> None:
        np.save(os.path.join(logits_dir, name + ".npy"),
                {"valid_lam": np.asarray(valid_lam, np.float32),
                 "keys_gt": np.asarray(keys, np.int64)})

    return save


# ---------------------------------------------------------------------------
# the streaming post-pass
# ---------------------------------------------------------------------------

def _make_job(dataset, logits_dir: str, crf, kind: str, save_pred):
    """-> one(i): load dataset[i] + its spilled npy, run the CRF, return
    (name, pred, label). The per-image math of the reference's `_job`s
    (tools/infer_seg_voc.py:131-162 / infer_seg_coco.py:121-157 /
    infer_lam.py:198-225)."""
    assert kind in ("seg", "lam"), kind

    def one(i: int):
        s = dataset[i]
        name = s["name"]
        d = np.load(os.path.join(logits_dir, name + ".npy"),
                    allow_pickle=True).item()
        image = np.ascontiguousarray(s["image"], np.uint8)
        h, w = image.shape[:2]
        if kind == "seg":
            logits = np.asarray(d["msc_seg"], np.float32)[0]
            if logits.shape[1:] != (h, w):
                logits = resize_bilinear(
                    np.transpose(logits, (1, 2, 0)), (h, w)).transpose(
                    2, 0, 1)
            x = logits - logits.max(0, keepdims=True)
            np.exp(x, out=x)
            x /= x.sum(0, keepdims=True)
            prob = crf(image, np.ascontiguousarray(x))
            pred = prob.argmax(0).astype(np.int32)
        else:
            lam = np.ascontiguousarray(d["valid_lam"], np.float32)
            keys = np.asarray(d["keys_gt"], np.int64)
            prob = crf(image, lam)
            slot = prob.argmax(0)
            # slot 0 = bg; slot k -> fg class keys[k-1] + 1
            full_keys = np.pad(keys + 1, (1, 0), mode="constant")
            pred = full_keys[slot].astype(np.int32)
        if save_pred is not None:
            save_pred(name, pred)
        return name, pred, np.asarray(s["label"])

    return one

def _stream_pool(n_jobs: int, fn, workers: int):
    """Run fn(0..n-1) on a thread pool, yielding results in order with at
    most 2 x workers jobs in flight (the memory bound)."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    inflight = 2 * workers
    with ThreadPoolExecutor(max_workers=workers) as pool:
        q: deque = deque()
        for i in range(n_jobs):
            q.append(pool.submit(fn, i))
            if len(q) >= inflight:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()


def run_crf_post(dataset, logits_dir: str, crf: DenseCRF, num_classes: int,
                 kind: str = "seg", num_workers: int | None = None,
                 save_pred=None, progress=None) -> np.ndarray:
    """Stream `dataset`'s spilled npy files through the dense CRF; return
    the LOCAL [C, C] int64 confusion hist (reduce with global_sum_host
    before scoring).

    kind="seg" (infer_seg_voc.py:131-162): load {"msc_seg"}, bilinearly
    upsample to the image size if spilled downscaled (COCO,
    infer_seg_coco.py:143-145 — resize BEFORE softmax), softmax over
    classes, CRF, argmax.
    kind="lam" (infer_lam.py:198-225): load {"valid_lam", "keys_gt"}, use
    the normed cams directly as the unary probabilities (no softmax), CRF,
    argmax, map slot indices back through keys (np.pad(keys+1, (1, 0))).

    save_pred(name, pred [H, W] int) optionally exports each refined map.
    dataset[i] must yield {"name", "image" u8 [H, W, 3], "label" [H, W]} —
    decode runs inside the pooled job.
    """
    one = _make_job(dataset, logits_dir, crf, kind, save_pred)
    workers = num_workers or default_workers()
    hist = np.zeros((num_classes, num_classes), np.int64)
    for name, pred, label in _stream_pool(len(dataset), one, workers):
        update_hist_np(hist, label, pred, num_classes)
        if progress:
            progress(1)
    return hist


class StreamingCrfPost:
    """Overlap the host CRF with the device sweep.

    The reference (and `run_crf_post`) runs the lattice pool only AFTER the
    full sweep, so total wall-clock = sweep + CRF tail. The device is idle
    during the tail and the host is idle during the sweep; submitting each
    image from the sweep's save_logits/save_lam_crf hook overlaps the two —
    total wall-clock ≈ max(sweep, CRF tail) instead of their sum. Exact:
    per-image work is `_make_job`'s, identical to the post-pass.

    MULTI-CORE HOSTS ONLY: the overlap needs spare cores for the pool
    beside the sweep's dispatch thread. On this repo's 1-core build VM a
    24-image A/B measured the streamed pass 13% SLOWER than the post-pass
    (pool/dispatch contention, 2026-08-20) — real TPU-VM hosts (~100
    cores) are the target.

    Usage:
        post = StreamingCrfPost(dataset, logits_dir, crf, C, kind="seg")
        spill = seg_logit_spiller(logits_dir)
        run_msc_seg_eval(..., save_logits=lambda n, l: (spill(n, l),
                                                        post.submit(n)))
        hist = post.finish()        # local hist; reduce before scoring

    Finished images fold into the hist incrementally (bounded memory);
    unstarted jobs hold only an index.
    """

    def __init__(self, dataset, logits_dir: str, crf, num_classes: int,
                 kind: str = "seg", num_workers: int | None = None,
                 save_pred=None):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        self._one = _make_job(dataset, logits_dir, crf, kind, save_pred)
        self._by_name = {n: i for i, n in enumerate(dataset.names())}
        self._pool = ThreadPoolExecutor(
            max_workers=num_workers or default_workers())
        # deque: the queue grows toward the shard size whenever the sweep
        # outpaces the pool — list.pop(0) would shift it per drain
        self._futures: deque = deque()
        self._hist = np.zeros((num_classes, num_classes), np.int64)
        self._done = 0

    def _drain(self, block: bool) -> None:
        while self._futures and (block or self._futures[0].done()):
            name, pred, label = self._futures.popleft().result()
            update_hist_np(self._hist, label, pred,
                           self._hist.shape[0])
            self._done += 1

    def submit(self, name: str) -> None:
        self._futures.append(self._pool.submit(self._one,
                                               self._by_name[name]))
        self._drain(block=False)

    def finish(self) -> np.ndarray:
        """Drain everything, shut the pool down, return the LOCAL hist."""
        self._drain(block=True)
        self._pool.shutdown()
        return self._hist
