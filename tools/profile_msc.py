"""Component breakdown of the MSC+flip seg eval step on the real TPU.

Times each piece of engine/evaluate.msc_hist_step (bench_suite protocol:
batch 8, scales 320x{1.0, 0.7, 1.2, 1.5}, 512 canvas, bf16 fast path) as a
separately-jitted program: the per-scale encoder forwards (197/401/577/901
tokens), the canvas upscale+accumulate, and the argmax+hist tail.
Dispatch-chained timing via utils/profiling.benchmark.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import fast, voc_config
from excel_tpu.engine.evaluate import (canvas_argmax, msc_accumulate,
                                       msc_hist_step, seg_grid_logits,
                                       upscale_to_canvas)
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.metrics import init_hist, update_hist
from excel_tpu.utils.profiling import benchmark

B = 8
CANVAS = (512, 512)
SCALES = (1.0, 0.7, 1.2, 1.5)


def main():
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    clip_params = cast_matmul_weights(init_clip_params(key, cfg.clip),
                                      jnp.bfloat16)
    params = init_excel_params(key, cfg, clip_params)
    rng = np.random.default_rng(0)
    cfgs = tuple(dataclasses.replace(
        cfg, clip=dataclasses.replace(cfg.clip, image_size=int(320 * s)))
        for s in SCALES)
    sized = tuple(jnp.asarray(rng.random((B, int(320 * s), int(320 * s), 3))
                              .astype(np.float32) * 255) for s in SCALES)
    valid = jnp.asarray([[375, 500]] * B, jnp.int32)
    gt = jnp.zeros((B,) + CANVAS, jnp.int32)
    ta = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)

    results = {}

    def rec(name, ms):
        results[name] = ms
        print(f"{name:34s} {ms:8.2f} ms", flush=True)

    for s, imgs, c in zip(SCALES, sized, cfgs):
        kf = s != 1.0
        n = 2 * B if kf else B
        cat = (jnp.concatenate([imgs, imgs[:, :, ::-1, :]], axis=0)
               if kf else imgs)

        fwd = jax.jit(functools.partial(seg_grid_logits, cfg=c))
        jax.block_until_ready(fwd(params, cat, text_attr=ta))
        tokens = (int(320 * s) // 16) ** 2 + 1
        r = benchmark(lambda x: fwd(params, x, text_attr=ta), cat, iters=6)
        rec(f"fwd scale {s} ({n}x{tokens}tok)", r["ms"])

        grid_logits = fwd(params, cat, text_attr=ta)[:B]

        up = jax.jit(functools.partial(upscale_to_canvas, canvas_hw=CANVAS))
        jax.block_until_ready(up(grid_logits, valid))
        r = benchmark(lambda g: up(g, valid), grid_logits, iters=6)
        rec(f"upscale scale {s}", r["ms"])

    acc = jnp.zeros((B, cfg.num_classes) + CANVAS, jnp.float32)

    @jax.jit
    def tail(acc, gt):
        return update_hist(init_hist(cfg.num_classes), gt, canvas_argmax(acc),
                           cfg.num_classes)

    jax.block_until_ready(tail(acc, gt))
    rec("argmax+hist", benchmark(tail, acc, gt, iters=6)["ms"])

    full = functools.partial(msc_hist_step, canvas=CANVAS, cfgs=cfgs,
                             keep_flips=tuple(s != 1.0 for s in SCALES))
    h = init_hist(cfg.num_classes)
    h = jax.block_until_ready(full(h, params, sized, gt, valid, ta))
    # hist is DONATED by msc_hist_step: feed a fresh one per timed call
    rec("FULL msc_hist_step", benchmark(
        lambda hh: full(hh, params, sized, gt, valid, ta),
        vary=lambda i: (init_hist(cfg.num_classes),), iters=6)["ms"])

    total = sum(ms for name, ms in results.items()
                if not name.startswith("FULL"))
    print(f"{'sum of stages':34s} {total:8.2f} ms")
    print(f"FULL: {B / (results['FULL msc_hist_step'] / 1e3):.1f} img/s")


if __name__ == "__main__":
    main()
