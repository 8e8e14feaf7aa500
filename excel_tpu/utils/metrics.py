"""Segmentation metrics: device-side streaming confusion matrix + scores.

Reference: utils/evaluate.py:9-95. The reference accumulates numpy hists on
the host per rank and never all-reduces them (tools/infer_lam.py:166-167);
here the hist update is a jitted scatter-add on device, the hist lives as a
(replicated or sharded) jax array, and a final `jax.device_get` of the
summed hist is globally correct under any mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",), donate_argnums=(0,))
def update_hist(hist: jax.Array, label_true: jax.Array,
                label_pred: jax.Array, num_classes: int) -> jax.Array:
    """hist [C, C] += bincount over valid pixels (evaluate.py:9-15).

    Pixels with true label outside [0, C) (e.g. 255-ignore) are dropped by
    routing them to a scratch bin.
    """
    lt = label_true.reshape(-1).astype(jnp.int32)
    lp = label_pred.reshape(-1).astype(jnp.int32)
    # one-hot matmul formulation: the natural [B*H*W] scatter-add lowers to
    # a ~30 ms serialized scatter on TPU at eval-canvas shapes; marking
    # true/pred classes as one-hots and contracting [C,N] @ [N,C] counts
    # the same pairs on the MXU in a few ms. Chunked f32 accumulation is
    # exact (every partial count < 2^24); cross-chunk sums are int32.
    valid = (lt >= 0) & (lt < num_classes)
    lt = jnp.where(valid, lt, num_classes)        # -> all-zero one-hot col
    n = lt.shape[0]
    # 1<<20 keeps the count-exactness bound (every partial count < 2^24)
    # while capping the two [C, chunk] one-hot transients — matters on the
    # CPU test mesh / small-HBM. bf16 one-hots are exact (values are 0/1)
    # and halve the transient bandwidth; the MXU accumulates in fp32.
    chunk = 1 << 20
    for i in range(0, n, chunk):
        a = jax.nn.one_hot(lt[i:i + chunk], num_classes,
                           dtype=jnp.bfloat16, axis=0)         # [C, n_i]
        b = jax.nn.one_hot(lp[i:i + chunk], num_classes,
                           dtype=jnp.bfloat16)                 # [n_i, C]
        hist = hist + jnp.dot(
            a, b, preferred_element_type=jnp.float32).astype(jnp.int32)
    return hist


def init_hist(num_classes: int) -> jax.Array:
    return jnp.zeros((num_classes, num_classes), jnp.int32)


def update_hist_np(hist: np.ndarray, label_true: np.ndarray,
                   label_pred: np.ndarray, num_classes: int) -> np.ndarray:
    """Pure-host `update_hist` (the reference's _fast_hist, evaluate.py:9-15):
    one vectorized bincount per call, in place on an int64 [C, C] hist.

    Used by the CRF post-processing tail (engine/crf_post.py) where
    predictions are host arrays already — dispatching a device program per
    image there would cost a tunnel round-trip each (VERDICT r4 #7)."""
    lt = np.asarray(label_true).reshape(-1).astype(np.int64)
    lp = np.asarray(label_pred).reshape(-1).astype(np.int64)
    valid = (lt >= 0) & (lt < num_classes)
    lpv = lp[valid]
    if lpv.size and not (0 <= int(lpv.min())
                         and int(lpv.max()) < num_classes):
        # a clear error beats bincount's oversized output crashing reshape
        # (e.g. a spill dir scored with a mismatched num_classes config)
        raise ValueError(
            f"label_pred range [{lpv.min()}, {lpv.max()}] outside "
            f"num_classes={num_classes} — config/spill mismatch?")
    idx = lt[valid] * num_classes + lpv
    hist += np.bincount(idx, minlength=num_classes ** 2).reshape(
        num_classes, num_classes)
    return hist


@functools.partial(jax.jit, static_argnames=("num_classes",), donate_argnums=(0,))
def update_hist_pseudo(hist: jax.Array, label_true: jax.Array,
                       label_pred: jax.Array, num_classes: int,
                       ignore_index: int = 255) -> jax.Array:
    """pseudo_scores' variant (evaluate.py:73-95): pixels the pseudo-label
    marks ignore are excluded from the ground truth too."""
    lp = label_pred.reshape(-1).astype(jnp.int32)
    lt = label_true.reshape(-1).astype(jnp.int32)
    lt = jnp.where(lp == ignore_index, ignore_index, lt)
    lp = jnp.where(lp == ignore_index, 0, lp)
    return update_hist(hist, lt, lp, num_classes)


def scores_from_hist(hist: np.ndarray) -> dict:
    """evaluate.py:17-50 (`scores`): pAcc/mAcc/mIoU (over classes present in
    GT), per-class iou/precision/recall/confusion-ratio."""
    hist = np.asarray(hist, np.float64)
    num_classes = hist.shape[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0)
                              - np.diag(hist))
        valid = hist.sum(axis=1) > 0
        mean_iu = np.nanmean(iu[valid])
        tp = np.diag(hist)
        fn = hist.sum(axis=1) - tp
        fp = hist.sum(axis=0) - tp
        cr = fp / tp
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
    rng = range(num_classes)
    return {"pAcc": acc, "mAcc": acc_cls, "miou": mean_iu,
            "iou": dict(zip(rng, iu)),
            "confusion": dict(zip(rng, cr)),
            "precision": dict(zip(rng, precision)),
            "recall": dict(zip(rng, recall))}


def format_metrics_table(score: dict, class_names: list[str],
                         metrics=("iou",)) -> str:
    """Per-class metric table (pyutils.py:8-58 format_tabs equivalents)."""
    cols = ["class"] + [m for m in metrics]
    rows = []
    for i, name in enumerate(class_names):
        rows.append([name] + [f"{100 * score[m][i]:.2f}" for m in metrics])
    rows.append(["mIoU"] + [f"{100 * score['miou']:.2f}"] +
                [""] * (len(metrics) - 1))
    widths = [max(len(str(r[c])) for r in [cols] + rows)
              for c in range(len(cols))]
    lines = ["  ".join(str(v).ljust(w) for v, w in zip(r, widths))
             for r in [cols] + rows]
    return "\n".join(lines)
