"""TSE — text-semantic enrichment via the attribute cluster bank.

Online aggregation (reference model/load_attr.py:86-120): each foreground
class embedding attends over the K-cluster bank; the `topK` masking drops the
LOWEST int((1-topK)*K) logits per class (load_attr.py:106 `corr[:, -topk:]`
after a descending sort — the effective behavior, whatever the flag name
suggests), softmaxes the rest, adds the aggregated attributes to the class
embedding, re-appends background classes, and L2-normalizes.

Offline clustering (attr_clustering, load_attr.py:10-84) lives in
tools/build_attr_bank.py; the shipped banks are converted under
assets/attributes/*.npz with the verified [512,K] + [C,K] layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def attr_aggregate(text_features: jax.Array, cluster_bank: jax.Array,
                   num_fg: int, top_keep: float = 0.9) -> jax.Array:
    """Enrich fg class embeddings with soft-aggregated cluster attributes.

    text_features: [T, C] prompt-ensemble class embeddings (fg then bg rows)
    cluster_bank:  [C, K] cluster centroid embeddings (note: feature-major,
                   matching the saved bank layout)
    Returns text_attr [T, C] row-normalized (the reference returns the
    transpose [C, T] and re-transposes at every use site — we keep rows).
    """
    fg = text_features[:num_fg].astype(jnp.float32)
    bg = text_features[num_fg:].astype(jnp.float32)
    bank = cluster_bank.astype(jnp.float32)
    K = bank.shape[1]

    logits = fg @ bank                              # [num_fg, K]
    n_drop = int((1.0 - top_keep) * K)
    if n_drop > 0:
        # mask the n_drop smallest logits per row to -inf (load_attr.py:99-112)
        order = jnp.argsort(-logits, axis=-1)       # descending
        sorted_vals = jnp.take_along_axis(logits, order, axis=-1)
        sorted_vals = sorted_vals.at[:, K - n_drop:].set(-jnp.inf)
        restored = jnp.zeros_like(logits)
        logits = jax.vmap(lambda r, o, v: r.at[o].set(v))(restored, order,
                                                          sorted_vals)
    corr = jax.nn.softmax(logits, axis=-1)
    fg_agg = corr @ bank.T + fg                     # [num_fg, C]

    out = jnp.concatenate([fg_agg, bg], axis=0)
    return out / jnp.linalg.norm(out, axis=1, keepdims=True)


def load_attr_bank(path: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Load a converted bank: returns (bank [embed,K], flags [num_fg,K])."""
    data = np.load(path)
    return jnp.asarray(data["cluster_bank"]), jnp.asarray(data["class_flags"])
