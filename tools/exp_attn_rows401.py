"""A/B: whole-N [401,401] surgery kernel vs row-chunked aligned grid at N=401.

The whole-N path measured 13.3 ms (need_attn=F) at [16,12,401,64] while the
N=901 row-chunked path was faster in absolute terms — suspicion: Mosaic's
handling of the unaligned 401-row/col blocks. The rows grid pads 401->512
(27% wasted rows) but every block is lane/sublane aligned.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from excel_tpu.models.attention_pallas import (
    _fused_surgery_attention_rows, _fused_surgery_attention_rows_hb,
    _fused_surgery_attention_rows_hb_ctx, fused_surgery_attention)
from excel_tpu.utils.profiling import benchmark

B, H, D = 16, 12, 64
N = int(os.environ.get("N", "401"))


def main():
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, N, D),
                                 jnp.bfloat16) for i in range(3))
    sf = 5 * 2 * B * H * N * N * D / 1e12

    rows = jax.jit(functools.partial(
        _fused_surgery_attention_rows, interpret=False),
        static_argnames=("chunk", "need_attn"))
    rows_hb = jax.jit(functools.partial(
        _fused_surgery_attention_rows_hb, interpret=False),
        static_argnames=("chunk", "need_attn"))

    cases = [
        ("whole-N need_attn=T", lambda: fused_surgery_attention(
            q, k, v, need_attn=True)[0]),
        ("whole-N need_attn=F", lambda: fused_surgery_attention(
            q, k, v, need_attn=False)[0]),
    ]
    chunks = (128, 256) if N <= 640 else (128, 256)
    for chunk in chunks:
        for na in (True, False):
            t = "T" if na else "F"
            cases.append((f"rows c={chunk} need_attn={t}",
                          functools.partial(
                              lambda ch, n_a: rows(q, k, v, None, chunk=ch,
                                                   need_attn=n_a)[0],
                              chunk, na)))
    hb_chunks = (128, 256, 512) if N <= 640 else (128, 256)
    for chunk in hb_chunks:
        for na in (True, False):
            t = "T" if na else "F"
            cases.append((f"rows_hb c={chunk} need_attn={t}",
                          functools.partial(
                              lambda ch, n_a: rows_hb(q, k, v, None, chunk=ch,
                                                      need_attn=n_a)[0],
                              chunk, na)))
    rows_hb_ctx = jax.jit(functools.partial(
        _fused_surgery_attention_rows_hb_ctx, interpret=False),
        static_argnames=("chunk", "need_attn"))
    for chunk in hb_chunks:
        for na in (True, False):
            t = "T" if na else "F"
            cases.append((f"rows_hb_ctx c={chunk} na={t}",
                          functools.partial(
                              lambda ch, n_a: rows_hb_ctx(
                                  q, k, v, None, chunk=ch,
                                  need_attn=n_a)[0],
                              chunk, na)))

    # compile the decisive cases first: the tunnel's remote-compile service
    # can take minutes per program, and a partial run must still answer
    # "does the aligned grid beat whole-N, and does in-kernel ctx help"
    def prio(case):
        name = case[0]
        order = ["whole-N need_attn=F", "rows_hb c=512 need_attn=F",
                 "rows_hb_ctx c=512 na=F", "whole-N need_attn=T",
                 "rows_hb c=512 need_attn=T", "rows_hb_ctx c=512 na=T",
                 "rows_hb c=256 need_attn=F", "rows_hb_ctx c=256 na=F",
                 "rows c=256 need_attn=F"]
        return order.index(name) if name in order else len(order)

    for name, fn in sorted(cases, key=prio):
        try:
            jax.block_until_ready(fn())
            r = benchmark(fn)
            print(f"{name:24s} {r['ms']:7.2f} ms {sf / (r['ms']/1e3):6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
