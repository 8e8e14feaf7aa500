"""A/B the full fused MSC step with candidate micro-optimizations.

Variants (each a fresh jit of engine/evaluate.msc_hist_step):
  base     — production fast path as-is
  ln_bf16  — LayerNorm reductions in bf16 (monkeypatched layers.layer_norm)
  both     — ln_bf16 + bf16 one-hot operands in the confusion hist

Fused-program timing only: isolated stage timings carry the tunnel's ~7 ms
dispatch floor and cannot attribute the last ~13 ms.
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

import excel_tpu.models.clip as clipmod
import excel_tpu.models.head as headmod
import excel_tpu.models.layers as layers
from excel_tpu.config import fast, voc_config
from excel_tpu.engine.evaluate import msc_hist_step
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.metrics import init_hist

B = 8
CANVAS = (512, 512)
SCALES = (1.0, 0.7, 1.2, 1.5)

_orig_ln = layers.layer_norm


def ln_bf16(x, p, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return out * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def set_ln(fn):
    for m in (layers, clipmod, headmod):
        m.layer_norm = fn


def main():
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    clip_params = cast_matmul_weights(init_clip_params(key, cfg.clip),
                                      jnp.bfloat16)
    params = init_excel_params(key, cfg, clip_params)
    rng = np.random.default_rng(0)
    ta = jax.random.normal(key, (45, 512))
    ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)
    valid = jnp.asarray([[375, 500]] * B, jnp.int32)
    cfgs = tuple(dataclasses.replace(
        cfg, clip=dataclasses.replace(cfg.clip, image_size=int(320 * s)))
        for s in SCALES)
    sized = tuple(jnp.asarray(rng.random((B, int(320 * s), int(320 * s), 3))
                              .astype(np.float32) * 255) for s in SCALES)
    gt = jnp.zeros((B,) + CANVAS, jnp.int32)
    kf = tuple(s != 1.0 for s in SCALES)

    def run(tag):
        def msc(hist):
            return msc_hist_step(hist, params, sized, gt, valid, ta, cfgs,
                                 CANVAS, kf)
        h = init_hist(21)
        for _ in range(2):
            h = msc(h)
        float(h.sum())
        best = 1e9
        for _ in range(3):
            h = init_hist(21)
            t0 = time.perf_counter()
            for _ in range(4):
                h = msc(h)
            float(h.sum())
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"{tag:10s} {best * 1e3:7.2f} ms  ({B / best:6.1f} img/s)",
              flush=True)

    run("base")
    jax.clear_caches()
    set_ln(ln_bf16)
    run("ln_bf16")
    set_ln(_orig_ln)


if __name__ == "__main__":
    main()
