"""Training losses (reference model/losses.py:4-31)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _ce_sum(logits: jax.Array, labels: jax.Array, valid: jax.Array):
    """Sum of per-pixel cross-entropy over valid pixels.

    logits [B, C, H, W] (fp32), labels [B, H, W] int, valid [B, H, W] bool.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    # class-compare select instead of take_along_axis: a per-pixel gather
    # over B*H*W crop-resolution pixels lowers to a ~25 ms scalar-unit op
    # on TPU; the compare-select fuses into the log_softmax pass. Values
    # are bit-identical (it picks the same single entry per pixel).
    c = logits.shape[1]
    onehot = labels[:, None] == jnp.arange(c, dtype=labels.dtype)[
        None, :, None, None]
    picked = jnp.where(onehot, logp, 0.0).sum(axis=1)
    return -(jnp.where(valid, picked, 0.0)).sum()


def seg_loss(logits: jax.Array, label: jax.Array,
             ignore_index: int = 255) -> jax.Array:
    """fg/bg-split cross-entropy, each mean-normalized separately, averaged
    (model/losses.py:4-18). logits [B, C, H, W], label [B, H, W]."""
    not_ignored = label != ignore_index
    bg = not_ignored & (label == 0)
    fg = not_ignored & (label != 0)
    bg_loss = _ce_sum(logits, label, bg) / (bg.sum() + 1e-6)
    fg_loss = _ce_sum(logits, label, fg) / (fg.sum() + 1e-6)
    return (bg_loss + fg_loss) * 0.5


def aff_loss(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """Pos/neg-balanced affinity loss (model/losses.py:20-31).

    inputs: sigmoid affinity predictions [B, hw, hw]
    targets: {0, 1, ignore} affinity labels.
    """
    pos = (targets == 1).astype(jnp.float32)
    neg = (targets == 0).astype(jnp.float32)
    pos_loss = (pos * (1.0 - inputs)).sum() / (pos.sum() + 1.0)
    neg_loss = (neg * inputs).sum() / (neg.sum() + 1.0)
    return 0.5 * pos_loss + 0.5 * neg_loss
