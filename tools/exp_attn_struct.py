"""Structural A/B of the plain no-weights attention kernel at MSC shapes.

profile_encoder round 3: the matmul tower runs ~80% MFU, attention ~3-5%.
exp_attn_flash: jax's flash kernel loses 1.8-3.6x at these shapes (B=16,
N<=901, h=12, d=64), so the fix must be in our own kernel structure.
Candidates, all computing EXACTLY fused_plain_attention(need_weights=False):

  base      current whole-N kernel, grid (b, h), in-kernel 256-row chunks
  rows_hb   heads-inside row-chunk grid (b, chunks) — production for N<=512;
            round-2 notes say it failed Mosaic compile at 901 (re-diagnose)
  recip     base but softmax as exp * (1/sum) broadcast-multiply instead of
            the per-element divide (div is multi-cycle on the VPU)
  bf16exp   base but exp computed in bf16 (packed 2/lane), f32 row-sum.
            NUMERICS PROBE ONLY — measures the VPU-softmax ceiling; adopting
            it would relax the fast-path's fp32-softmax contract.

Interleaved best-of-R medians (shared-chip drift cancels across rounds).
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from excel_tpu.models.attention_pallas import (_fused_plain_attention_rows_hb,
                                               _row_chunks,
                                               fused_plain_attention)
from excel_tpu.utils.profiling import benchmark

B = int(os.environ.get("BENCH_BATCH", "16"))
K = 6
ROUNDS = 5


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


def _kernel_variant(q_ref, k_ref, v_ref, ctx_ref, *, scale: float,
                    softmax: str):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    for c0, sz in _row_chunks(q.shape[0]):
        logits = jax.lax.dot_general(
            q[c0:c0 + sz], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if softmax == "recip":
            m = logits.max(axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            attn = e * (1.0 / e.sum(axis=-1, keepdims=True))
        elif softmax == "bf16exp":
            m = logits.max(axis=-1, keepdims=True)
            e = jnp.exp((logits - m).astype(jnp.bfloat16))
            s = e.astype(jnp.float32).sum(axis=-1, keepdims=True)
            attn = e.astype(jnp.float32) * (1.0 / s)
        else:
            attn = jax.nn.softmax(logits, axis=-1)
        ctx_ref[0, 0, c0:c0 + sz] = jnp.dot(
            attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(ctx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("softmax",))
def plain_variant(q, k, v, softmax: str):
    b, heads, n, d = q.shape
    kernel = functools.partial(_kernel_variant, scale=d ** -0.5,
                               softmax=softmax)
    specs = [pl.BlockSpec((1, 1, n, d), lambda i, h: (i, h, 0, 0),
                          memory_space=pltpu.VMEM)] * 3
    ctx = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((b, heads, n, d), q.dtype),
        grid=(b, heads), in_specs=specs, out_specs=specs[0])(q, k, v)
    return ctx


def surgery_vmem_main():
    """Surgery at N=901: production rows grid (pads to 1024, +13% work on
    every matmul/softmax) vs the whole-N kernel unlocked by raising the
    per-kernel scoped-VMEM limit past the 16 MB default (v5e has far more
    physical VMEM; the whole-N [901,901] f32 blocks need ~20 MB)."""
    from excel_tpu.models.attention_pallas import (_kernel,
                                                   fused_surgery_attention)
    key = jax.random.PRNGKey(0)
    h, d, n = 12, 64, 901
    q = jax.random.normal(key, (B, h, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, h, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, h, n, d), jnp.bfloat16)

    @jax.jit
    def whole_vmem(q, k, v):
        b = q.shape[0]
        kernel = functools.partial(_kernel, scale=d ** -0.5, heads=h,
                                   has_ex=False, weights="none")
        qkv_spec = pl.BlockSpec((1, 1, n, d), lambda i, hh: (i, hh, 0, 0),
                                memory_space=pltpu.VMEM)
        nn_spec = pl.BlockSpec((1, n, n), lambda i, hh: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        ex_spec = pl.BlockSpec((1, 1, 1), lambda i, hh: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        shared, ctx = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((b, n, n), jnp.float32),
                       jax.ShapeDtypeStruct((b, h, n, d), q.dtype)),
            grid=(b, h),
            in_specs=[qkv_spec] * 3 + [ex_spec],
            out_specs=(nn_spec, qkv_spec),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q, k, v, jnp.zeros((1, 1, 1), jnp.float32))
        return shared, ctx

    def rows(q):
        sh, at, co = fused_surgery_attention(q, k, v, None, need_attn=False)
        return sh.sum() + co.astype(jnp.float32).sum()

    def whole(q):
        sh, co = whole_vmem(q, k, v)
        return sh.sum() + co.astype(jnp.float32).sum()

    sh_r, _, co_r = fused_surgery_attention(q, k, v, None, need_attn=False)
    sh_w, co_w = whole_vmem(q, k, v)
    err = float(jnp.max(jnp.abs(sh_r - sh_w)))
    res = {"rows": [], "whole_vmem": []}
    for _ in range(ROUNDS):
        res["rows"].append(chained_ms(rows, q))
        res["whole_vmem"].append(chained_ms(whole, q))
    for name, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"n=901 surgery {name:10s} {med:6.2f} ms "
              f"(runs {' '.join(f'{t:.2f}' for t in ts)}) maxerr {err:.2e}",
              flush=True)


def main():
    key = jax.random.PRNGKey(0)
    h, d = 12, 64
    for n in (401, 577, 901):
        q = jax.random.normal(key, (B, h, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, h, n, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, h, n, d),
                              jnp.bfloat16)

        def base(q):
            ctx, _ = fused_plain_attention(q, k, v, need_weights=False)
            return ctx.astype(jnp.float32).sum()

        def rows_hb(q):
            ctx, _ = _fused_plain_attention_rows_hb(q, k, v, False,
                                                    chunk=256,
                                                    need_weights=False)
            return ctx.astype(jnp.float32).sum()

        def recip(q):
            return plain_variant(q, k, v, "recip").astype(jnp.float32).sum()

        def bf16exp(q):
            return plain_variant(q, k, v, "bf16exp").astype(jnp.float32).sum()

        cands = {"base": base, "recip": recip, "bf16exp": bf16exp,
                 "rows_hb": rows_hb}
        # parity vs base (bf16exp is expected to differ by ~1e-2 rel)
        ref, _ = fused_plain_attention(q, k, v, need_weights=False)
        ref = ref.astype(jnp.float32)
        fns = {}
        for name, fn in list(cands.items()):
            try:
                jax.block_until_ready(fn(q))
                fns[name] = fn
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"n={n} {name}: FAILED {msg}", flush=True)
        errs = {}
        for name, fn in fns.items():
            if name == "base":
                continue
            if name == "rows_hb":
                got, _ = _fused_plain_attention_rows_hb(
                    q, k, v, False, chunk=256, need_weights=False)
            else:
                got = plain_variant(q, k, v,
                                    "recip" if name == "recip" else "bf16exp")
            errs[name] = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                               - ref)))
        res = {name: [] for name in fns}
        for _ in range(ROUNDS):
            for name, fn in fns.items():
                res[name].append(chained_ms(fn, q))
        for name, ts in res.items():
            med = sorted(ts)[len(ts) // 2]
            e = f" maxerr {errs[name]:.2e}" if name in errs else ""
            print(f"n={n:4d} {name:8s} {med:6.2f} ms "
                  f"(runs {' '.join(f'{t:.2f}' for t in ts)}){e}",
                  flush=True)


if __name__ == "__main__":
    if os.environ.get("EXP") == "surgery":
        surgery_vmem_main()
    else:
        main()
