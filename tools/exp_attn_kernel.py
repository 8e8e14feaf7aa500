"""Fused attention kernel rate at the encoder's production shapes.

Times fused_plain_attention / fused_surgery_attention at [B=16, H=12,
N=401, D=64] (320px LAM) and N=901 (480px MSC), against their matmul
FLOPs, to see how far the kernels run from the MXU's shape-limited rate.
Also times the pure-XLA jnp formulations for reference.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.models.attention_pallas import (fused_plain_attention,
                                               fused_surgery_attention)
from excel_tpu.utils.profiling import benchmark

B, H, D = 16, 12, 64


def main():
    for n in (401, 901):
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                     (B, H, n, D), jnp.bfloat16)
                   for i in range(3))
        acc = jnp.zeros((B, n, n), jnp.float32)

        # plain: qk^T + attn@v = 2 matmuls of 2*N^2*D
        pf = 2 * 2 * B * H * n * n * D / 1e12
        # surgery: 4 sims + ctx = 5 matmuls
        sf = 5 * 2 * B * H * n * n * D / 1e12

        for name, fn, fl in (
            ("plain need_weights=F", lambda: fused_plain_attention(
                q, k, v, need_weights=False)[0], pf),
            ("plain acc", lambda: fused_plain_attention(
                q, k, v, acc=acc)[0], pf),
            ("surgery need_attn=F", lambda: fused_surgery_attention(
                q, k, v, need_attn=False)[0], sf),
            ("surgery acc", lambda: fused_surgery_attention(
                q, k, v, acc=acc)[0], sf),
        ):
            try:
                out = fn()
                jax.block_until_ready(out)
                r = benchmark(fn)
                print(f"N={n} {name:22s} {r['ms']:7.2f} ms "
                      f"{fl / (r['ms'] / 1e3):6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"N={n} {name:22s} FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
