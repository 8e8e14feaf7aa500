"""Feature surgery + similarity maps (reference clip/clip.py:272-310).

TPU-first note: the reference materializes a [B, N, T, C] elementwise-product
tensor (clip/clip.py:301-303) before reducing over C. The same math factors
into two MXU matmuls:

    sim[b,n,t] = w[b,t] * (img @ text^T)[b,n,t] - (img @ m[b]^T)[b,n]
    m[b,c]     = mean_t  w[b,t] * text[t,c]

because redundant_feats is a mean over the class axis of a rank-1-in-C
product. No [B,N,T,C] intermediate ever exists on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_feature_surgery(image_features: jax.Array,
                         text_features: jax.Array) -> jax.Array:
    """LAM scores for every token (incl. CLS) against every class.

    image_features: [B, N, C] (already token-dim normalized, CLS at index 0)
    text_features:  [T, C]    (enriched class embeddings, fg + bg classes)
    Returns attr_maps [B, N, T], min-max normalized over the token dim
    (reference clip/clip.py:288-310; the final `.detach()` is a stop_gradient
    boundary — the encoder is frozen here so it is a no-op for us).
    """
    img = image_features.astype(jnp.float32)
    txt = text_features.astype(jnp.float32)

    # CLS-probability reweighting (clip/clip.py:292-295)
    prob = jnp.einsum("bc,tc->bt", img[:, 0, :], txt,
                      preferred_element_type=jnp.float32)
    prob = jax.nn.softmax(prob * 2.0, axis=-1)
    w = prob / prob.mean(axis=-1, keepdims=True)

    sim = jnp.einsum("bnc,tc->bnt", img, txt,
                     preferred_element_type=jnp.float32) * w[:, None, :]
    m = jnp.einsum("bt,tc->bc", w, txt,
                   preferred_element_type=jnp.float32) / txt.shape[0]
    sim = sim - jnp.einsum("bnc,bc->bn", img, m,
                           preferred_element_type=jnp.float32)[:, :, None]

    lo = sim.min(axis=1, keepdims=True)
    hi = sim.max(axis=1, keepdims=True)
    return (sim - lo) / (hi - lo)


def get_similarity_map(sm: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """[B, N_patches, T] scores -> [B, H, W, T] bilinear maps
    (clip/clip.py:272-285). N_patches must be a square count (no CLS)."""
    lo = sm.min(axis=1, keepdims=True)
    hi = sm.max(axis=1, keepdims=True)
    sm = (sm - lo) / (hi - lo)
    b, n, t = sm.shape
    side = int(round(n ** 0.5))
    sm = sm.reshape(b, side, side, t)
    return jax.image.resize(sm, (b, shape[0], shape[1], t), method="linear")


def similarity_map_to_points(sm, shape: tuple[int, int], t: float = 0.8,
                             down_sample: int = 2):
    """Similarity map -> positive/negative point prompts (clip/clip.py:
    314-346, the SAM-style point extraction utility).

    sm: [N_patches] scores (one class map, no CLS). Host-side numpy: the
    output count is data-dependent. Returns (points [[x, y], ...],
    labels uint8 [1]*num + [0]*num).
    """
    import numpy as np

    from ..data.resize import resize_bilinear

    sm = np.asarray(sm, np.float32)
    side = int(round(sm.shape[0] ** 0.5))
    down = side // down_sample
    small = resize_bilinear(sm.reshape(side, side), (down, down)).reshape(-1)
    small = (small - small.min()) / (small.max() - small.min())
    rank = np.argsort(small, kind="stable")
    scale_h = shape[0] / down
    scale_w = shape[1] / down

    num = int(min((small >= t).sum(), small.shape[0] // 2))
    labels = np.ones(num * 2, np.uint8)
    labels[num:] = 0

    def to_point(idx):
        x = min((idx % down + 0.5) * scale_w, shape[1] - 1)
        y = min((idx // down + 0.5) * scale_h, shape[0] - 1)
        return [int(x), int(y)]

    points = [to_point(i) for i in rank[-num:]] + \
        [to_point(i) for i in rank[:num]]
    return points, labels
