"""SVC — attention-affinity LAM refinement (reference utils/affutils.py).

TPU-first redesign of the reference's per-image, per-class Python loop with
cv2 round-trips (affutils.py:177-223, SURVEY.md §3.1 "most TPU-hostile
pattern"):

* `scoremap2bbox` (cv2 threshold + findContours + boundingRect,
  affutils.py:26-53) becomes a jit-able connected-components labeling on the
  tiny score grid (label propagation to a fixed point) followed by a
  per-component bbox union. Union over ALL RETR_TREE contours' boxes equals
  union over connected components' boxes (inner/hole contours are nested in
  their parents), so the semantics match, including the `min(x+w, W-1)` /
  `min(y+h, H-1)` clipping quirk that drops the last row/column of
  edge-touching components.
* the per-class `trans_mat * aff_mask @ cam` loop (affutils.py:206-221)
  collapses to ONE [hw, hw] @ [hw, C] matmul since the column mask commutes
  into the right operand: (T * m_c^T) @ cam_c == T @ (m_c * cam_c).
* everything is batched over images with vmap and over ALL fg classes with a
  fixed class axis; absent classes are masked downstream, never looped over.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def compute_trans_mat(attn: jax.Array) -> jax.Array:
    """Sinkhorn-style normalization + symmetrize + one squaring
    (affutils.py:8-24). attn: [hw, hw]."""
    t = attn.astype(jnp.float32)
    t = t / t.sum(axis=0, keepdims=True)
    t = t / t.sum(axis=1, keepdims=True)
    for _ in range(2):
        t = t / t.sum(axis=0, keepdims=True)
        t = t / t.sum(axis=1, keepdims=True)
    t = (t + t.T) / 2.0
    return t @ t


# ---------------------------------------------------------------------------
# scoremap -> union-of-component-bboxes mask (cv2-equivalent, jit-able)
# ---------------------------------------------------------------------------

def _propagate_labels(mask: jax.Array) -> jax.Array:
    """8-connected component labels via min-label propagation to fixed point.

    mask: [h, w] bool. Returns [h, w] int32; background pixels get h*w.
    """
    h, w = mask.shape
    big = h * w
    init = jnp.where(mask, jnp.arange(big, dtype=jnp.int32).reshape(h, w), big)

    def step(lab):
        p = jnp.pad(lab, 1, constant_values=big)
        neigh = jnp.stack([p[dy:dy + h, dx:dx + w]
                           for dy in range(3) for dx in range(3)])
        return jnp.where(mask, neigh.min(axis=0), big)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = step(lab)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return lab


def scoremap_box_mask(score: jax.Array, threshold: float) -> jax.Array:
    """Union of per-component bounding boxes of the thresholded score map.

    score: [h, w] float (a min-max-normalized LAM). Replicates cv2 semantics
    (affutils.py:26-53): quantize to uint8 by truncation, binary threshold at
    int(threshold * max), bbox per 8-connected component with the exclusive
    upper edge clipped to size-1. Returns [h, w] float32 {0,1} mask.
    """
    h, w = score.shape
    q = jnp.clip(score * 255.0, 0, 255).astype(jnp.uint8)
    thr = (threshold * q.max().astype(jnp.float32)).astype(jnp.int32)
    binary = q.astype(jnp.int32) > thr

    lab = _propagate_labels(binary).reshape(-1)
    n = h * w
    rows = jnp.arange(n, dtype=jnp.int32) // w
    cols = jnp.arange(n, dtype=jnp.int32) % w

    seg_min = functools.partial(jax.ops.segment_min, num_segments=n + 1,
                                indices_are_sorted=False)
    seg_max = functools.partial(jax.ops.segment_max, num_segments=n + 1,
                                indices_are_sorted=False)
    y0 = seg_min(rows, lab)[:n]
    y1 = jnp.minimum(seg_max(rows, lab)[:n] + 1, h - 1)
    x0 = seg_min(cols, lab)[:n]
    x1 = jnp.minimum(seg_max(cols, lab)[:n] + 1, w - 1)
    count = jax.ops.segment_sum(jnp.ones_like(lab), lab, num_segments=n + 1)[:n]
    valid = count > 0

    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    row_in = (valid[:, None] & (ys[None, :] >= y0[:, None])
              & (ys[None, :] < y1[:, None])).astype(jnp.float32)
    col_in = ((xs[None, :] >= x0[:, None])
              & (xs[None, :] < x1[:, None])).astype(jnp.float32)
    return ((row_in.T @ col_in) > 0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# refinement
# ---------------------------------------------------------------------------

def aggregate_attn(attn_weights: jax.Array, attn_layers: int,
                   seg_attn: jax.Array | None = None) -> jax.Array:
    """Average the last `attn_layers` blocks' patch-patch attention; when a
    decoder attention is supplied, keep only blocks whose deviation from it is
    below the mean and elementwise-multiply by it (affutils.py:180-198).

    attn_weights: [L, hw+1, hw+1] per-block token attention (one image)
    seg_attn:     optional [hw, hw]
    Returns [hw, hw].
    """
    aw = attn_weights[-attn_layers:, 1:, 1:].astype(jnp.float32)
    if seg_attn is None:
        return aw.mean(axis=0)
    diff = (seg_attn[None] - aw).reshape(attn_layers, -1).sum(axis=1)
    keep = (diff <= diff.mean()).astype(jnp.float32)[:, None, None]
    merged = (keep * aw).sum(axis=0) / (keep.sum() + 1e-5)
    return merged * seg_attn


def refine_lams(lams: jax.Array, attn: jax.Array, caa_threshold: float,
                grid_hw: tuple[int, int]) -> jax.Array:
    """SVC refinement of every class map of one image (affutils.py:200-221).

    lams: [C, hw] raw LAM scores (min-max normalized, patch tokens only)
    attn: [hw, hw] aggregated attention (from aggregate_attn)
    Returns refined [C, hw] (absent classes produce garbage rows; mask them
    downstream with the image's class label).
    """
    h, w = grid_hw
    trans = compute_trans_mat(attn)
    masks = jax.vmap(
        lambda m: scoremap_box_mask(m.reshape(h, w), caa_threshold))(lams)
    masked = masks.reshape(lams.shape) * lams
    return (trans @ masked.T).T


def refine_lams_batch(lams: jax.Array, attn_weights: jax.Array,
                      caa_threshold: float, grid_hw: tuple[int, int],
                      attn_layers: int = 6,
                      seg_attn: jax.Array | None = None) -> jax.Array:
    """Batched SVC: lams [B, C, hw], attn_weights either the per-block stack
    [L, B, N, N] or the PRE-AGGREGATED block mean [B, N, N] (the encoder's
    attn_mode="mean" output — only valid without seg_attn, whose per-block
    keep-mask needs the stack). seg_attn optional [B, hw, hw].
    Returns [B, C, hw]."""
    if attn_weights.ndim == 3:
        assert seg_attn is None, "pre-aggregated attention cannot drive " \
            "the seg_attn keep-mask (needs the per-block stack)"
        agg = attn_weights[:, 1:, 1:].astype(jnp.float32)
    else:
        aw = jnp.moveaxis(attn_weights, 1, 0)      # [B, L, N, N]
        if seg_attn is None:
            agg = jax.vmap(lambda a: aggregate_attn(a, attn_layers))(aw)
        else:
            agg = jax.vmap(lambda a, s: aggregate_attn(a, attn_layers, s))(
                aw, seg_attn)
    return jax.vmap(lambda l, a: refine_lams(l, a, caa_threshold, grid_hw))(
        lams, agg)
