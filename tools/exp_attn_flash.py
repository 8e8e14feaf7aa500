"""A/B: our plain no-weights Pallas kernel vs jax's tuned TPU flash kernel.

profile_encoder (round 3) showed the matmul tower at ~80% MFU but the
attention kernels at ~3-5%: per (batch, head) grid steps serialize the
softmax's VPU work against idle MXUs. jax.experimental's flash_attention
kv-blocks the softmax online, so Mosaic can overlap exp (VPU) with the
next block's matmul (MXU) — the structure our whole-N kernel lacks.

Only the no-weights path can use it (flash never materializes the [N, N]
matrix, and the SVC/need_weights path consumes exactly that matrix), so
the A/B covers attn_mode='none' shapes: MSC's 197/401/577/901 tokens and
the LAM forward's 6 pre-window blocks at 401.

N is padded to the next 128-multiple; padded KEY columns are masked via
segment ids (padded QUERY rows produce garbage that the caller crops —
same contract as attention_pallas._fused_plain_attention_rows_hb).
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.models.attention_pallas import fused_plain_attention
from excel_tpu.utils.profiling import benchmark

B = int(os.environ.get("BENCH_BATCH", "16"))
K = 6


def chained_ms(step, *args) -> float:
    def prog(x0, *rest):
        acc = jnp.float32(0)
        x = x0
        for _ in range(K):
            s = step(x, *rest)
            acc = acc + s
            x = x + (s * jnp.float32(1e-30)).astype(x.dtype)
        return acc
    prog = jax.jit(prog)
    jax.block_until_ready(prog(*args))
    return benchmark(prog, *args, iters=4)["ms"] / K


def flash_padded(q, k, v, n_pad: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)
    b, h, n, d = q.shape
    pad = n_pad - n
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    ids = (jnp.arange(n_pad) < n).astype(jnp.int32)[None].repeat(b, 0)
    ctx = flash_attention(q, k, v, segment_ids=SegmentIds(ids, ids),
                          sm_scale=d ** -0.5)
    return ctx[:, :, :n, :] if pad else ctx


def main():
    key = jax.random.PRNGKey(0)
    h, d = 12, 64
    for n in (197, 401, 577, 901):
        n_pad = -(-n // 128) * 128
        q = jax.random.normal(key, (B, h, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, h, n, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, h, n, d),
                              jnp.bfloat16)

        def ours(q):
            ctx, _ = fused_plain_attention(q, k, v, need_weights=False)
            return ctx.astype(jnp.float32).sum()

        def flash(q):
            return flash_padded(q, k, v, n_pad).astype(jnp.float32).sum()

        # parity first (bf16 kernels; tolerances follow the existing
        # fused-vs-jnp kernel tests)
        ref, _ = fused_plain_attention(q, k, v, need_weights=False)
        got = flash_padded(q, k, v, n_pad)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        t_ours = chained_ms(ours, q)
        t_flash = chained_ms(flash, q)
        print(f"n={n:4d} ours {t_ours:6.2f} ms   flash {t_flash:6.2f} ms  "
              f"(maxerr {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
