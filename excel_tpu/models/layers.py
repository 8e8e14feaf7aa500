"""Functional building blocks shared by the CLIP encoders and the LVC head.

Numerics notes (parity targets, see /root/reference/clip/clip_surgery_model.py):
- LayerNorm always computes in float32 and casts back (reference LayerNorm
  subclass, clip_surgery_model.py:271-277).
- QuickGELU is x * sigmoid(1.702 x) (:280-282).
- Standard attention returns the head-MEAN of the softmax weights (torch
  nn.MultiheadAttention need_weights semantics), while the surgery attention
  returns the head-SUM of the original-path weights (:154) — downstream SVC
  consumes a mix of both, so the distinction matters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(orig)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def linear(x: jax.Array, p: dict) -> jax.Array:
    # cast weights to the activation dtype: in bf16 mode this keeps the
    # matmul on the MXU's native bf16 path (fp32 weights would promote the
    # whole product back to fp32); accumulation stays fp32 either way
    out = jnp.dot(x, p["w"].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def mlp(x: jax.Array, p: dict) -> jax.Array:
    return linear(quick_gelu(linear(x, p["fc"])), p["proj"])


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    """[B, N, C] -> [B, heads, N, C//heads]."""
    b, n, c = x.shape
    return x.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, heads, N, D] -> [B, N, heads*D]."""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def qkv_projection(y: jax.Array, p: dict, heads: int):
    """Fused qkv projection -> per-head q, k, v ([B, H, N, D] each)."""
    qkv = linear(y, p["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return split_heads(q, heads), split_heads(k, heads), split_heads(v, heads)


def _softmax32(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)


def attention(y: jax.Array, p: dict, heads: int, mask: jax.Array | None = None):
    """Standard multi-head self-attention over pre-normed input.

    Returns (output [B,N,C], head-mean attention weights [B,N,N]) — matching
    torch nn.MultiheadAttention with need_weights=True.
    """
    q, k, v = qkv_projection(y, p, heads)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    weights = _softmax32(logits)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = linear(merge_heads(ctx), p["out"])
    return out, weights.mean(axis=1)


def surgery_attention(y: jax.Array, p: dict, heads: int,
                      ex_attn: jax.Array | None = None):
    """ExCEL dual-path attention (reference Attention.forward, :95-159).

    From one qkv projection computes:
      * the original qk-softmax path (feeds the CLS/original stream),
      * the dense value-value path: mean of softmax(qq^T), softmax(kk^T),
        softmax(vv^T), optionally calibrated by an external feature-affinity
        softmax on the patch-patch block, then SUMMED over heads so every head
        aggregates v with the same shared matrix (:146-149).

    Returns (dense_out, ori_out, head-summed original weights [B,N,N]).
    """
    q, k, v = qkv_projection(y, p, heads)
    scale = q.shape[-1] ** -0.5

    logits_ori = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                            preferred_element_type=jnp.float32)
    attn_ori = _softmax32(logits_ori)

    def self_sim(t):
        return _softmax32(jnp.einsum("bhnd,bhmd->bhnm", t * scale, t,
                                     preferred_element_type=jnp.float32))

    attn = (self_sim(q) + self_sim(k) + self_sim(v)) / 3.0
    if ex_attn is not None:
        # ex_attn [B, M, M] over patch tokens; added to every head's
        # patch-patch block (reference :127-141)
        patch = attn[:, :, 1:, 1:] + ex_attn[:, None, :, :]
        attn = attn.at[:, :, 1:, 1:].set(patch)

    shared = attn.sum(axis=1, keepdims=True)            # [B,1,N,N]
    ctx_dense = jnp.einsum("bsnm,bhmd->bhnd", shared.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
    ctx_ori = jnp.einsum("bhnm,bhmd->bhnd", attn_ori.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)

    dense_out = linear(merge_heads(ctx_dense), p["out"])
    ori_out = linear(merge_heads(ctx_ori), p["out"])
    return dense_out, ori_out, attn_ori.sum(axis=1)


def attention_fused(y: jax.Array, p: dict, heads: int,
                    interpret: bool = False,
                    attn_acc: jax.Array | None = None,
                    need_weights: bool = True):
    """`attention` (no mask) via the plain fused Pallas kernel.

    attn_acc: optional [B,N,N] fp32 running attention-mean accumulator the
    kernel adds its head-mean onto in place (cross-block accumulation of the
    training-free path). need_weights=False skips the weight output
    entirely (blocks whose attention nothing consumes)."""
    from .attention_pallas import fused_plain_attention

    q, k, v = qkv_projection(y, p, heads)
    ctx, w = fused_plain_attention(q, k, v, interpret=interpret,
                                   acc=attn_acc, need_weights=need_weights)
    return linear(merge_heads(ctx), p["out"]), w


def surgery_attention_fused(y: jax.Array, p: dict, heads: int,
                            ex_attn: jax.Array | None = None,
                            interpret: bool = False,
                            attn_acc: jax.Array | None = None,
                            need_attn: bool = True):
    """`surgery_attention` via the fused Pallas kernel (attention matrices
    never hit HBM per-head; see models/attention_pallas.py). attn_acc /
    need_attn control the head-summed original-weights output as in
    `attention_fused`."""
    from .attention_pallas import fused_surgery_attention

    q, k, v = qkv_projection(y, p, heads)
    ex = None
    if ex_attn is not None:
        # zero CLS row/col == adding only to the patch-patch block
        ex = jnp.pad(ex_attn, ((0, 0), (1, 0), (1, 0)))
    shared, attn_sum, ctx_ori = fused_surgery_attention(
        q, k, v, ex, interpret=interpret, acc=attn_acc,
        need_attn=need_attn)
    ctx_dense = jnp.einsum(
        "bnm,bhmd->bhnd", shared.astype(v.dtype), v,
        preferred_element_type=jnp.float32).astype(v.dtype)
    dense_out = linear(merge_heads(ctx_dense), p["out"])
    ori_out = linear(merge_heads(ctx_ori), p["out"])
    return dense_out, ori_out, attn_sum


def external_feature_attention(ex_feats: jax.Array, beta: float = 1.0,
                               gamma: float = 3.0) -> jax.Array:
    """LVC feature-affinity calibration mask (reference :127-137).

    ex_feats: [B, C, H, W] fused LVC features. Returns softmax over a
    thresholded global-mean-centered cosine-similarity map, [B, HW, HW].
    """
    b, c, h, w = ex_feats.shape
    flat = ex_feats.reshape(b, c, h * w)
    flat = flat / jnp.maximum(jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    sim = jnp.einsum("bcm,bcn->bmn", flat, flat,
                     preferred_element_type=jnp.float32)
    sim = (sim - sim.mean() * beta) * gamma
    sim = jnp.where(sim < 0.0, -jnp.inf, sim)
    return jax.nn.softmax(sim, axis=-1)
