"""Encoder decomposition on the real TPU: where do the forward's ms go?

Times, at the headline shape (B=16, bf16 fast path):
  - vision_forward per attn mode and MSC scale (320/384/480px)
  - a no-surgery variant (surgery_blocks=0, vanilla ViT) as the plain floor
  - the two Pallas attention kernels standalone at the same [B, 12, N, 64]
  - an FFN/matmul-only tower (12x ln+mlp+qkv+out shapes) as the MXU floor

All timings CHAIN the measured function K times inside ONE jitted program
(a tiny data dependency serializes the copies), so the tunnel's ~5-6 ms
per-dispatch floor amortizes to noise — separately-dispatched stage
timings on this setup are floored and misleading (see CLAUDE.md).
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
from excel_tpu.models.layers import layer_norm, linear, mlp
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.profiling import benchmark

B = int(os.environ.get("BENCH_BATCH", "16"))
K = 6


def chained_ms(step, *args) -> float:
    """Per-call ms of `step(*args) -> scalar f32`, measured as K serialized
    in-program copies; the single program dispatch's floor divides by K."""
    def prog(x0, *rest):
        acc = jnp.float32(0)
        x = x0
        for _ in range(K):
            s = step(x, *rest)
            acc = acc + s
            # serialize the next copy on s without changing the value in
            # any way XLA can prove (so the copies can't run as one)
            x = x + (s * jnp.float32(1e-30)).astype(x.dtype)
        return acc
    prog = jax.jit(prog)
    jax.block_until_ready(prog(*args))
    return benchmark(prog, *args, iters=4)["ms"] / K


def main():
    cfg = fast(voc_config()).clip
    key = jax.random.PRNGKey(0)
    params = cast_matmul_weights(init_clip_params(key, cfg), jnp.bfloat16)
    rng = np.random.default_rng(0)

    def rec(name, ms):
        print(f"{name:46s} {ms:8.2f} ms", flush=True)

    def fwd_scalar(c, mode):
        def step(im):
            out = vision_forward(params, im, c, attn_mode=mode)
            s = out["projected"].astype(jnp.float32).sum()
            if out.get("attn") is not None:
                s = s + out["attn"].astype(jnp.float32).sum()
            return s
        return step

    for px, modes in ((320, ("mean", "none")), (384, ("none",)),
                      (480, ("none",))):
        c = dataclasses.replace(cfg, image_size=px)
        im = jnp.asarray(rng.random((B, px, px, 3), np.float32))
        tok = (px // 16) ** 2 + 1
        for mode in modes:
            rec(f"vision_forward {px}px ({tok}tok) attn={mode}",
                chained_ms(fwd_scalar(c, mode), im))

    vcfg = dataclasses.replace(cfg, surgery_blocks=0, attn_out_layers=None)
    im = jnp.asarray(rng.random((B, 320, 320, 3), np.float32))
    rec("vanilla ViT (no surgery) 320px attn=none",
        chained_ms(fwd_scalar(vcfg, "none"), im))

    h, d = cfg.vision_heads, cfg.vision_width // cfg.vision_heads
    for n in (401, 577, 901):
        q = jax.random.normal(key, (B, h, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, h, n, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, h, n, d),
                              jnp.bfloat16)

        def plain_step(q, nw):
            ctx, w = fused_plain_attention(q, k, v, need_weights=nw)
            s = ctx.astype(jnp.float32).sum()
            return s + w.sum() if w is not None else s

        def surgery_step(q, na):
            sh, at, co = fused_surgery_attention(q, k, v, None, need_attn=na)
            s = sh.sum() + co.astype(jnp.float32).sum()
            return s + at.sum() if at is not None else s

        for nw in (True, False):
            rec(f"fused_plain_attention n={n} weights={nw}",
                chained_ms(functools.partial(plain_step, nw=nw), q))
        for na in (True, False):
            rec(f"fused_surgery_attention n={n} attn={na}",
                chained_ms(functools.partial(surgery_step, na=na), q))

    blocks = params["visual"]["blocks"]

    def tower_step(x):
        for blk in blocks:
            y = linear(layer_norm(x, blk["ln_1"]), blk["attn"]["qkv"])
            x = x + linear(y[..., :x.shape[-1]], blk["attn"]["out"])
            x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"])
        return x.astype(jnp.float32).sum()

    for n in (401, 901):
        x0 = jax.random.normal(key, (B, n, cfg.vision_width), jnp.bfloat16)
        rec(f"matmul tower n={n} (qkv+out+ffn x12, no attn)",
            chained_ms(tower_step, x0))


if __name__ == "__main__":
    main()
