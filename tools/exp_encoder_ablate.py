"""Where does the encoder matmul tower lose MFU?

Times, at the 401-token B=16 shape ([6416, 768] rows), a 12-block chain at
increasing fidelity: pure matmuls only (the MXU ceiling), +residual adds,
+fp32 LayerNorms, +QuickGELU (= the full non-attention tower), and a
bf16-LayerNorm variant. The gap between steps says whether Pallas-fusing
LN/GELU into the matmuls is worth building or XLA's matmul MFU is the wall.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from excel_tpu.config import fast, voc_config
from excel_tpu.models.layers import layer_norm, linear, mlp
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.profiling import benchmark

B, N = 16, 401


def main():
    cfg = fast(voc_config()).clip
    key = jax.random.PRNGKey(0)
    params = cast_matmul_weights(init_clip_params(key, cfg), jnp.bfloat16)
    blocks = params["visual"]["blocks"]
    w = cfg.vision_width
    x0 = jax.random.normal(key, (B, N, w), jnp.bfloat16)

    # FLOPs of the non-attention matmuls: qkv + out + fc + proj per block
    flops = 12 * (w * 3 * w + w * w + w * 4 * w + 4 * w * w) * 2 * B * N

    def rec(name, ms):
        print(f"{name:44s} {ms:8.2f} ms  {flops / (ms / 1e3) / 1e12:6.1f} "
              "TF/s", flush=True)

    def dot(x, wt):
        return jax.lax.dot_general(
            x, wt["w"].astype(x.dtype), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    @jax.jit
    def pure(x):
        for blk in blocks:
            y = dot(x, blk["attn"]["qkv"])
            x = dot(y[..., :w], blk["attn"]["out"])
            h = dot(x, blk["mlp"]["fc"])
            x = dot(h, blk["mlp"]["proj"])
        return x

    @jax.jit
    def with_res(x):
        for blk in blocks:
            y = dot(x, blk["attn"]["qkv"])
            x = x + dot(y[..., :w], blk["attn"]["out"])
            h = dot(x, blk["mlp"]["fc"])
            x = x + dot(h, blk["mlp"]["proj"])
        return x

    @jax.jit
    def with_ln(x):
        for blk in blocks:
            y = dot(layer_norm(x, blk["ln_1"]), blk["attn"]["qkv"])
            x = x + dot(y[..., :w], blk["attn"]["out"])
            h = dot(layer_norm(x, blk["ln_2"]), blk["mlp"]["fc"])
            x = x + dot(h, blk["mlp"]["proj"])
        return x

    def ln_bf16(x, p):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)

    @jax.jit
    def with_ln16(x):
        for blk in blocks:
            y = dot(ln_bf16(x, blk["ln_1"]), blk["attn"]["qkv"])
            x = x + dot(y[..., :w], blk["attn"]["out"])
            h = dot(ln_bf16(x, blk["ln_2"]), blk["mlp"]["fc"])
            x = x + dot(h, blk["mlp"]["proj"])
        return x

    @jax.jit
    def full(x):
        for blk in blocks:
            y = linear(layer_norm(x, blk["ln_1"]), blk["attn"]["qkv"])
            x = x + linear(y[..., :w], blk["attn"]["out"])
            x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"])
        return x

    cases = (("pure matmuls", pure), ("+residuals", with_res),
             ("+fp32 LN", with_ln), ("+bf16 LN (no gelu)", with_ln16),
             ("full tower (fp32 LN + gelu + bias)", full))
    for name, f in cases:
        jax.block_until_ready(f(x0))
    best = {name: float("inf") for name, _ in cases}
    # interleave repeats so shared-chip drift hits every variant equally;
    # keep the per-variant MIN (least-contended observation)
    for _ in range(4):
        for name, f in cases:
            best[name] = min(best[name], benchmark(f, x0, iters=8)["ms"])
    for name, _ in cases:
        rec(name, best[name])


if __name__ == "__main__":
    main()
