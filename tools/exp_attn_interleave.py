"""Interleaved A/B of ALL surgery/plain attention implementations.

The shared chip drifts up to 2x between runs (CLAUDE.md), which swamps
comparisons when each variant is timed in its own process. Here every
variant is compiled once, then timed in R alternating rounds
(A,B,C,A,B,C,...) inside ONE process; the per-variant MEDIAN of round
times cancels the drift. Decides the production dispatch in
models/attention_pallas.py.

Every case maps q,k,v -> ONE scalar that sums every output the production
caller consumes (ctx_dense + ctx_ori + attn_sum for surgery; ctx + weights
for plain), so XLA cannot dead-code-eliminate an output some variant
produces for free, and only a scalar crosses the tunnel.

Env knobs:
  N=401,901       token counts to test
  NA=T,F          need_attn / need_weights values
  SUR=default,rows:256,rows_hb:256,rows_hb:512,rows_hb_ctx:256,rows_hb_ctx:512,xla
  PLAIN=default,rows_hb:256,rows_hb:512,xla
  ROUNDS=5        interleaved timing rounds
Set SUR= or PLAIN= (empty) to skip that family.
"""
from __future__ import annotations

import functools
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from excel_tpu.models.attention_pallas import (
    _fused_plain_attention_rows_hb, _fused_surgery_attention_rows,
    _fused_surgery_attention_rows_hb, _fused_surgery_attention_rows_hb_ctx,
    fused_plain_attention, fused_surgery_attention)
from excel_tpu.utils.profiling import benchmark

B, H, D = 16, 12, 64
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def _csv(name: str, default: str) -> list[str]:
    raw = os.environ.get(name, default)
    return [s for s in raw.split(",") if s]


# --- scalar-reducing wrappers (jitted, q/k/v as ARGUMENTS) ----------------

def _sur_scalar(ctx_dense, attn_sum, ctx_ori):
    s = (ctx_dense.sum().astype(jnp.float32)
         + ctx_ori.sum().astype(jnp.float32))
    if attn_sum is not None:
        s = s + attn_sum.sum()
    return s


@functools.partial(jax.jit, static_argnames=("need_attn",))
def sur_default(q, k, v, need_attn):
    shared, attn_sum, ctx_ori = fused_surgery_attention(
        q, k, v, need_attn=need_attn)
    ctx_dense = jnp.einsum("bnm,bhmd->bhnd", shared.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
    return _sur_scalar(ctx_dense, attn_sum, ctx_ori)


@functools.partial(jax.jit, static_argnames=("chunk", "need_attn", "kind"))
def sur_rows(q, k, v, kind, chunk, need_attn):
    fn = {"rows": _fused_surgery_attention_rows,
          "rows_hb": _fused_surgery_attention_rows_hb}[kind]
    shared, attn_sum, ctx_ori = fn(q, k, v, None, False, chunk=chunk,
                                   need_attn=need_attn)
    ctx_dense = jnp.einsum("bnm,bhmd->bhnd", shared.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
    return _sur_scalar(ctx_dense, attn_sum, ctx_ori)


@functools.partial(jax.jit, static_argnames=("chunk", "need_attn"))
def sur_ctx(q, k, v, chunk, need_attn):
    ctx_dense, attn_sum, ctx_ori = _fused_surgery_attention_rows_hb_ctx(
        q, k, v, None, False, chunk=chunk, need_attn=need_attn)
    return _sur_scalar(ctx_dense, attn_sum, ctx_ori)


@functools.partial(jax.jit, static_argnames=("need_attn",))
def sur_xla(q, k, v, need_attn):
    scale = q.shape[-1] ** -0.5

    def sm(a, b):
        return jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", a * scale, b,
                       preferred_element_type=jnp.float32), axis=-1)

    attn_ori = sm(q, k)
    shared = ((sm(q, q) + sm(k, k) + sm(v, v)) / 3.0).sum(axis=1)
    ctx_dense = jnp.einsum("bnm,bhmd->bhnd", shared.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
    ctx_ori = jnp.einsum("bhnm,bhmd->bhnd", attn_ori.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
    attn_sum = attn_ori.sum(axis=1) if need_attn else None
    return _sur_scalar(ctx_dense, attn_sum, ctx_ori)


@functools.partial(jax.jit, static_argnames=("need_weights",))
def plain_default(q, k, v, need_weights):
    ctx, w = fused_plain_attention(q, k, v, need_weights=need_weights)
    s = ctx.sum().astype(jnp.float32)
    return s + w.sum() if w is not None else s


@functools.partial(jax.jit, static_argnames=("chunk", "need_weights"))
def plain_rows_hb(q, k, v, chunk, need_weights):
    ctx, w = _fused_plain_attention_rows_hb(q, k, v, False, chunk=chunk,
                                            need_weights=need_weights)
    s = ctx.sum().astype(jnp.float32)
    return s + w.sum() if w is not None else s


@functools.partial(jax.jit, static_argnames=("need_weights",))
def plain_xla(q, k, v, need_weights):
    scale = q.shape[-1] ** -0.5
    w = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                   preferred_element_type=jnp.float32), axis=-1)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    s = ctx.sum().astype(jnp.float32)
    return s + w.mean(axis=1).sum() if need_weights else s


CHAIN = int(os.environ.get("CHAIN", "8"))


def _chained(fn_scalar):
    """K data-dependent invocations inside ONE program: per-dispatch tunnel
    overhead (~5-8 ms, comparable to the kernels at N=401) amortizes K-fold,
    and the s-feedback defeats CSE between the K copies."""

    @jax.jit
    def run(q, k, v):
        s = jnp.float32(0)
        for _ in range(CHAIN):
            s = s + fn_scalar(q + (s * 1e-30).astype(q.dtype), k, v)
        return s

    return run


def run_block(title: str, cases: list[tuple[str, object]], args):
    print(f"--- {title} (per-call ms, chain={CHAIN}) ---", flush=True)
    live = []
    for name, fn in cases:
        try:
            cfn = _chained(fn)
            jax.block_until_ready(cfn(*args))
            live.append((name, cfn, []))
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {e}"[:140],
                  flush=True)
    for _ in range(ROUNDS):
        for name, fn, times in live:
            times.append(benchmark(fn, *args, iters=2, warmup=1)["ms"]
                         / CHAIN)
    for name, fn, times in live:
        med = statistics.median(times)
        print(f"{name:28s} med {med:7.2f} ms  runs "
              + " ".join(f"{t:.2f}" for t in times), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    nas = [s == "T" for s in _csv("NA", "T,F")]
    sur = _csv("SUR", "default,rows:256,rows_hb:256,rows_hb:512,"
                      "rows_hb_ctx:256,rows_hb_ctx:512,xla")
    plain = _csv("PLAIN", "default,rows_hb:256,rows_hb:512,xla")

    for n in (int(x) for x in _csv("N", "401,901")):
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, n, D),
                                     jnp.bfloat16) for i in range(3))
        for na in nas:
            cases = []
            for spec in sur:
                kind, _, chunk = spec.partition(":")
                chunk = int(chunk or 256)
                if kind == "default":
                    lbl = "whole-N" if n <= 640 else "rows c=256"
                    cases.append((f"default ({lbl})", functools.partial(
                        sur_default, need_attn=na)))
                elif kind in ("rows", "rows_hb"):
                    cases.append((f"{kind} c={chunk}", functools.partial(
                        sur_rows, kind=kind, chunk=chunk, need_attn=na)))
                elif kind == "rows_hb_ctx":
                    cases.append((f"rows_hb_ctx c={chunk}", functools.partial(
                        sur_ctx, chunk=chunk, need_attn=na)))
                elif kind == "xla":
                    cases.append(("xla", functools.partial(
                        sur_xla, need_attn=na)))
            if cases:
                run_block(f"surgery N={n} need_attn={na}", cases, (q, k, v))
            cases = []
            for spec in plain:
                kind, _, chunk = spec.partition(":")
                chunk = int(chunk or 256)
                if kind == "default":
                    cases.append(("plain whole-N", functools.partial(
                        plain_default, need_weights=na)))
                elif kind == "rows_hb":
                    cases.append((f"plain rows_hb c={chunk}",
                                  functools.partial(plain_rows_hb,
                                                    chunk=chunk,
                                                    need_weights=na)))
                elif kind == "xla":
                    cases.append(("plain xla", functools.partial(
                        plain_xla, need_weights=na)))
            if cases:
                run_block(f"plain N={n} need_weights={na}", cases, (q, k, v))


if __name__ == "__main__":
    main()
