"""On-chip cost of the coarse long-range CRF level (ops/crf_tpu.py).

Interleaved A/B at the production shape of the crf_tpu suite row (B=4,
C=21, 512x512 canvas, 375x500 valid, bf16 messages via fast()): fine-only
vs fine + coarse, dispatch-chained with one scalar fetch per window
(CLAUDE.md tunnel discipline). Decides whether CrfConfig.long_range
defaults on for production --crf-tpu.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import fast, voc_config
from excel_tpu.ops.crf_tpu import crf_meanfield_cfg


def main():
    cfg = fast(voc_config())
    rng = np.random.default_rng(0)
    B, C, H, W = 4, 21, 512, 512
    ci = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    probs = jax.nn.softmax(jnp.asarray(
        rng.random((B, C, H, W)).astype(np.float32)), axis=1)
    v = jnp.asarray([[375, 500]] * B, jnp.int32)
    # explicit on BOTH sides: long_range defaults ON since r5, so the
    # fine side must force it off or the A/B compares identical programs
    variants = {"fine": dataclasses.replace(cfg.crf, long_range=False),
                "fine+coarse": dataclasses.replace(cfg.crf,
                                                   long_range=True)}

    def chain(c, iters):
        q = probs
        for _ in range(iters):
            q = crf_meanfield_cfg(ci, q, c, valid_hw=v)
        float(q[0, 0, 0, 0])

    for name, c in variants.items():
        t0 = time.perf_counter()
        chain(c, 1)
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s (compile)",
              flush=True)
    best = {k: float("inf") for k in variants}
    for rnd in range(3):
        for name, c in variants.items():
            t0 = time.perf_counter()
            chain(c, 4)
            dt = (time.perf_counter() - t0) / 4
            best[name] = min(best[name], dt)
            print(f"round{rnd} {name:12s} {dt * 1e3:7.2f} ms/batch "
                  f"{B / dt:6.1f} img/s", flush=True)
    f, fc = best["fine"], best["fine+coarse"]
    print(f"best fine {f * 1e3:.2f} ms, +coarse {fc * 1e3:.2f} ms "
          f"-> overhead {100 * (fc - f) / f:.1f}%", flush=True)


if __name__ == "__main__":
    main()
