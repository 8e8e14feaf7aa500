"""Profiling and benchmarking helpers (SURVEY.md §5.1 — the reference has no
tracing/profiling at all; here they are first-class).

- `trace(logdir)`: context manager around jax.profiler.trace — produces a
  TensorBoard-loadable xplane trace of device execution.
- `benchmark(fn, *args)`: robust wall-clock of a jitted function. Dispatches
  all iterations before one device fetch: on tunneled/remote backends
  `block_until_ready` can return before execution finishes and per-call
  output fetches dominate, so every iteration's output is folded into one
  scalar that is fetched once.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _to_scalar(out) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0)
    for leaf in leaves[:1]:      # one leaf is enough to force the program
        acc = acc + leaf.sum().astype(jnp.float32)
    return acc


def benchmark(fn: Callable, *args, iters: int = 8, warmup: int = 2,
              vary: Callable | None = None) -> dict:
    """Time `fn(*args)` (or `fn(*vary(i))` when `vary` is given — use it to
    defeat any caching of identical dispatches). Returns
    {"ms": per-call milliseconds, "calls_per_s": 1/s}."""
    for i in range(warmup):
        out = fn(*(vary(i) if vary else args))
    float(_to_scalar(out))
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(iters):
        out = fn(*(vary(i) if vary else args))
        acc = acc + _to_scalar(out)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    return {"ms": dt * 1e3, "calls_per_s": 1.0 / dt}
