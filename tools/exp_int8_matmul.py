"""Probe: does the v5e's int8 MXU path beat bf16 at OUR encoder shapes?

Motivation: MSC seg eval is 92% encoder-bound (README COCO roofline) and the
bf16 matmul tower already runs at ~80% MFU — the only lever left that is not
"more of the same kernel tuning" is a lower-precision MXU path (v5e peaks
~394 TOPS int8 vs ~197 TFLOPs bf16). This answers, on the real chip, whether
XLA actually emits the 2x int8 path at ViT-B/16 tower shapes and how much
the per-row dynamic activation-quantization (amax + round, VPU) eats.

Methodology (the r3 lesson, CLAUDE.md): single dispatches through the tunnel
are floored at ~5-6 ms — a lone matmul measures the floor, not the MXU. Each
variant therefore runs a CHAIN of `depth` dependent MLP blocks inside ONE
jitted program (mimicking the 12-block tower; data feeds forward so nothing
is CSE'd or dead-code-eliminated) and reports per-block ms + effective
TFLOPs. Interleaved best-of-W medians across variants.

Variants (per block: fc1 [d->4d] + fc2 [4d->d], d=768):
  bf16   : the production fast path (bf16 x bf16 -> f32 acc)
  w8a8   : per-row dynamic act quant -> int8 x int8 dot -> f32 dequant,
           both matmuls; weights pre-quantized per-column (frozen CLIP ->
           free offline)

Usage: python tools/exp_int8_matmul.py   (needs the real TPU)
Env: ITERS (default 8), WINDOWS (default 3), DEPTH (default 24), M rows
(default 14400 = B16 x 901 tokens, the MSC hot shape; try M=6400 for LAM).

RESULT (v5e via tunnel, 2026-08-19, M=14400 depth=24 iters=8 windows=3 —
the MSC hot shape, most favorable case): bf16 0.864 ms/block = 157.3
TFLOPs (matches the 80% tower MFU from tools/profile_encoder.py,
validating the chain methodology); w8a8 0.709 ms/block = 191.7 TFLOPs
effective = **1.22x**, far under the nominal 2x — the per-row
quant/dequant VPU work eats most of the int8 headroom (int8 lands at
~49% of its 394-TOPS peak). With qkv/proj at smaller N gaining less and
attention/LN unquantized, end-to-end encoder gain would be <=~12% for a
real accuracy risk on a zero-shot model. VERDICT: DROP. (A first,
single-dispatch version of this probe reported 5-25 "TFLOPs" — it was
measuring the tunnel's ~5 ms dispatch floor, not the MXU; per-variant
work must be chained inside ONE program on this setup.)
"""
from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from excel_tpu.utils.profiling import benchmark  # noqa: E402

D = 768


def _quant_rows(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    return xq, s


def make_chain(depth: int, kind: str):
    if kind == "bf16":
        @jax.jit
        def chain(x, w1, w2):
            def body(y, _):
                h = jnp.dot(y, w1, preferred_element_type=jnp.float32)
                h = (h * jax.nn.sigmoid(1.702 * h)).astype(jnp.bfloat16)
                y = jnp.dot(h, w2, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
                return y * jax.lax.rsqrt(jnp.float32(4.0)).astype(y.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=depth)
            return y.sum()
        return chain
    if kind == "w8a8":
        @jax.jit
        def chain(x, w1q, s1, w2q, s2):
            def body(y, _):
                xq, sr = _quant_rows(y)
                h = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                h = h.astype(jnp.float32) * sr * s1[None, :]
                h = (h * jax.nn.sigmoid(1.702 * h)).astype(jnp.bfloat16)
                hq, sr2 = _quant_rows(h)
                y = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32) * sr2 * s2[None, :]
                     ).astype(jnp.bfloat16)
                return y * jax.lax.rsqrt(jnp.float32(4.0)).astype(y.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=depth)
            return y.sum()
        return chain
    raise ValueError(kind)


def main():
    iters = int(os.environ.get("ITERS", "8"))
    windows = int(os.environ.get("WINDOWS", "3"))
    depth = int(os.environ.get("DEPTH", "24"))
    m = int(os.environ.get("M", "14400"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, D), np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, 4 * D), np.float32) * 0.02,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * D, D), np.float32) * 0.02,
                     jnp.bfloat16)
    w1q, s1 = _quant_rows(w1.T.astype(jnp.float32))     # per-out-col scales
    w1q, s1 = w1q.T, s1[:, 0]
    w2q, s2 = _quant_rows(w2.T.astype(jnp.float32))
    w2q, s2 = w2q.T, s2[:, 0]

    runs = {
        "bf16": (make_chain(depth, "bf16"), (x, w1, w2)),
        "w8a8": (make_chain(depth, "w8a8"), (x, w1q, s1, w2q, s2)),
    }
    times = {k: [] for k in runs}
    for _ in range(windows):
        for k, (fn, args) in runs.items():
            times[k].append(benchmark(fn, *args, iters=iters)["ms"])
    flops_block = 2.0 * m * D * 4 * D * 2               # fc1 + fc2
    out = {"m": m, "depth": depth, "iters": iters, "windows": windows}
    for k, ts in times.items():
        per_block_ms = float(np.median(ts)) / depth
        out[k + "_ms_per_block"] = round(per_block_ms, 4)
        out[k + "_tflops"] = round(flops_block / (per_block_ms * 1e-3) / 1e12,
                                   1)
    out["w8a8_speedup"] = round(out["bf16_ms_per_block"]
                                / out["w8a8_ms_per_block"], 3)
    out["verdict"] = "PURSUE" if out["w8a8_speedup"] > 1.3 else "DROP"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
