"""Encoder decomposition on the real TPU: where do the forward's ms go?

Times, at the headline shape (B=16, 320px -> 401 tokens, bf16 fast path):
  - vision_forward in each attn mode (mean / none / stack)
  - a no-surgery variant (surgery_blocks=0, vanilla ViT) as the plain floor
  - the two Pallas attention kernels standalone at [16, 12, 401, 64]
  - an FFN/matmul-only tower (12x ln+mlp+qkv+out shapes) as the MXU floor
Dispatch-chained timing via utils/profiling.benchmark.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import fast, voc_config
from excel_tpu.models.attention_pallas import (fused_plain_attention,
                                               fused_surgery_attention)
from excel_tpu.models.clip import vision_forward
from excel_tpu.models.layers import layer_norm, linear, mlp, quick_gelu
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.profiling import benchmark

B = 16


def main():
    cfg = fast(voc_config()).clip
    key = jax.random.PRNGKey(0)
    params = cast_matmul_weights(init_clip_params(key, cfg), jnp.bfloat16)
    rng = np.random.default_rng(0)
    size = cfg.image_size
    images = jnp.asarray(rng.random((B, size, size, 3), np.float32))

    def rec(name, ms):
        print(f"{name:42s} {ms:8.2f} ms", flush=True)

    for mode in ("mean", "none", "stack"):
        fwd = jax.jit(functools.partial(vision_forward, cfg=cfg,
                                        attn_mode=mode))
        jax.block_until_ready(fwd(params, images))
        rec(f"vision_forward attn={mode}",
            benchmark(lambda im: fwd(params, im), images, iters=6)["ms"])

    vcfg = dataclasses.replace(cfg, surgery_blocks=0, attn_out_layers=None)
    fwd = jax.jit(functools.partial(vision_forward, cfg=vcfg,
                                    attn_mode="none"))
    jax.block_until_ready(fwd(params, images))
    rec("vanilla ViT (no surgery) attn=none",
        benchmark(lambda im: fwd(params, im), images, iters=6)["ms"])

    # MSC scales: 480px -> 901 tokens, 384px -> 577 tokens
    for px in (384, 480):
        c2 = dataclasses.replace(cfg, image_size=px)
        im2 = jnp.asarray(rng.random((B, px, px, 3), np.float32))
        fwd = jax.jit(functools.partial(vision_forward, cfg=c2,
                                        attn_mode="mean"))
        jax.block_until_ready(fwd(params, im2))
        tok = (px // 16) ** 2 + 1
        rec(f"vision_forward attn=mean {px}px ({tok}tok)",
            benchmark(lambda im: fwd(params, im), im2, iters=6)["ms"])

    h, d = cfg.vision_heads, cfg.vision_width // cfg.vision_heads
    for n in (401, 577, 901):
        q = jax.random.normal(key, (B, h, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, h, n, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, h, n, d),
                              jnp.bfloat16)
        for nw in (True, False):
            f = jax.jit(functools.partial(fused_plain_attention,
                                          need_weights=nw))
            jax.block_until_ready(f(q, k, v))
            rec(f"fused_plain_attention n={n} weights={nw}",
                benchmark(f, q, k, v, iters=8)["ms"])
        for na in (True, False):
            f = jax.jit(functools.partial(fused_surgery_attention,
                                          need_attn=na))
            jax.block_until_ready(f(q, k, v))
            rec(f"fused_surgery_attention n={n} attn={na}",
                benchmark(f, q, k, v, iters=8)["ms"])
    n = 401

    blocks = params["visual"]["blocks"]

    @jax.jit
    def matmul_tower(x):
        # every non-attention matmul of the 12 blocks: qkv, out-proj, 2 FFN
        for blk in blocks:
            y = linear(layer_norm(x, blk["ln_1"]), blk["attn"]["qkv"])
            x = x + linear(y[..., :x.shape[-1]], blk["attn"]["out"])
            x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"])
        return x

    x0 = jax.random.normal(key, (B, n, cfg.vision_width), jnp.bfloat16)
    jax.block_until_ready(matmul_tower(x0))
    rec("matmul tower (qkv+out+ffn x12, no attn)",
        benchmark(matmul_tower, x0, iters=8)["ms"])


if __name__ == "__main__":
    main()
