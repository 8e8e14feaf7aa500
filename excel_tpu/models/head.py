"""LVC trainable head: SegFormer-style fusion + transformer decoder.

Parity targets:
- SegFormerHead            model/segformer_head.py:47-77 (12 per-block
  Linear-ReLU-Linear MLPs, concat, 1x1-conv fuse, Dropout2d 0.1)
- DecoderTransformer       model/decoder/TransDecoder.py:105-124 (3-layer
  post-LN transformer, width 256, QuickGELU MLP, 1x1-conv classifier; the
  vendored MultiheadAttention returns head-averaged weights, which our
  `attention` already does)
- attn_pred                model/model_excel.py:70-76 (channel-normalized
  feature gram, global-mean-centered, sigmoid(3*(g - mean)))

Layout: tokens-major [B, hw, D] throughout — 1x1 convs are channel matmuls,
so there is never a reason to materialize NCHW on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import HeadConfig
from .layers import attention, layer_norm, linear, mlp


def init_head_params(key: jax.Array, cfg: HeadConfig,
                     num_classes: int) -> dict:
    """torch-default inits (kaiming_uniform(a=sqrt5) == U(+-1/sqrt(fan_in)))."""
    def lin(k, fan_in, fan_out):
        kw, kb = jax.random.split(k)
        bound = fan_in ** -0.5
        return {"w": jax.random.uniform(kw, (fan_in, fan_out),
                                        minval=-bound, maxval=bound),
                "b": jax.random.uniform(kb, (fan_out,),
                                        minval=-bound, maxval=bound)}

    d = cfg.embedding_dim
    keys = jax.random.split(key, cfg.num_blocks * 2 + 2 + cfg.decoder_layers * 4 + 1)
    ki = iter(range(len(keys)))

    fuse_mlps = [{"proj": lin(keys[next(ki)], cfg.in_channels, d),
                  "proj2": lin(keys[next(ki)], d, d)}
                 for _ in range(cfg.num_blocks)]
    linear_fuse = lin(keys[next(ki)], d * cfg.num_blocks, d)

    def block(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "ln_1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "attn": {"qkv": lin(k1, d, 3 * d), "out": lin(k2, d, d)},
            "ln_2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "mlp": {"fc": lin(k3, d, 4 * d), "proj": lin(k4, 4 * d, d)},
        }

    decoder_blocks = [block(keys[next(ki)]) for _ in range(cfg.decoder_layers)]
    # consume remaining split keys for the classifier
    classifier = lin(keys[-1], d, num_classes)
    return {"fuse_mlps": fuse_mlps, "linear_fuse": linear_fuse,
            "decoder": decoder_blocks, "classifier": classifier}


def segformer_fuse(params: dict, feats: jax.Array, cfg: HeadConfig,
                   *, dropout_rng: jax.Array | None = None,
                   dropout_rate: float = 0.0) -> jax.Array:
    """feats [num_blocks, B, hw, in_channels] -> fused [B, hw, embed].

    Dropout2d drops whole CHANNELS per sample (torch semantics); pass a rng
    only in training.
    """
    outs = []
    for i, p in enumerate(params["fuse_mlps"]):
        x = feats[i].astype(jnp.float32)
        x = linear(x, p["proj"])
        x = jax.nn.relu(x)
        x = linear(x, p["proj2"])
        outs.append(x)
    fused = linear(jnp.concatenate(outs, axis=-1), params["linear_fuse"])
    if dropout_rng is not None and dropout_rate > 0.0:
        b, _, c = fused.shape
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, (b, 1, c))
        fused = fused * keep / (1.0 - dropout_rate)
    return fused


def decoder_forward(params: dict, x: jax.Array, cfg: HeadConfig):
    """x [B, hw, embed] -> (logits [B, hw, num_classes],
    attn [layers, B, hw, hw] head-averaged)."""
    attns = []
    for blk in params["decoder"]:
        y, w = attention(layer_norm(x, blk["ln_1"]), blk["attn"],
                         cfg.decoder_heads)
        x = x + y
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"])
        attns.append(w)
    logits = linear(x, params["classifier"])
    return logits, jnp.stack(attns, axis=0)


def feature_affinity(fused: jax.Array) -> jax.Array:
    """attn_pred (model/model_excel.py:70-76): sigmoid(3*(gram - mean)).

    fused [B, hw, C]; gram over channel-normalized features; the mean is
    GLOBAL over the whole batch tensor (torch.mean with no dim).
    """
    f = fused.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    g = jnp.einsum("bnc,bmc->bnm", f, f, preferred_element_type=jnp.float32)
    return jax.nn.sigmoid((g - g.mean()) * 3.0)
