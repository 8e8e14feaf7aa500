"""Batch sweep for the two headline steps (VERDICT round-1 item 1c).

Measures img/s vs batch for: the encoder forward alone (401/901 tokens),
the full training-free LAM sweep step (lam_eval_hist_step, 384x512 canvas,
4 class slots), and the full MSC+flip seg step — to pick the production
batch sizes. Dispatch-chained timing (utils/profiling.benchmark).
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
from excel_tpu.models.clip import vision_forward
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.profiling import benchmark

CANVAS = (384, 512)


def main():
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    clip_params = cast_matmul_weights(init_clip_params(key, cfg.clip),
                                      jnp.bfloat16)
    params = {"clip": clip_params}
    full_params = init_excel_params(key, cfg, clip_params)
    rng = np.random.default_rng(0)
    ta = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)

    def rec(name, ms, n):
        print(f"{name:40s} {ms:8.2f} ms  {n / (ms / 1e3):7.1f} img/s",
              flush=True)

    for px, tok in ((320, 401), (480, 901)):
        c2 = dataclasses.replace(cfg.clip, image_size=px)
        for b in (16, 32):
            im = jnp.asarray(rng.random((b, px, px, 3), np.float32))
            fwd = jax.jit(functools.partial(vision_forward, cfg=c2,
                                            attn_mode="none"))
            jax.block_until_ready(fwd(clip_params, im))
            r = benchmark(lambda x: fwd(clip_params, x), im, iters=6)
            rec(f"vision_forward {tok}tok attn=none B={b}", r["ms"], b)

    from excel_tpu.engine.evaluate import lam_eval_hist_step
    from excel_tpu.utils.metrics import init_hist
    for b in (16, 32, 64):
        im = jnp.asarray(rng.random((b, 320, 320, 3)).astype(np.float32)
                         * 255)
        cls_label = np.zeros((b, cfg.num_fg), np.float32)
        cls_label[:, :3] = 1.0
        cls_label = jnp.asarray(cls_label)
        valid = jnp.asarray([[375, 500]] * b, jnp.int32)
        gt = jnp.zeros((b,) + CANVAS, jnp.int32)

        def step(hist, im=im, cls_label=cls_label, gt=gt, valid=valid):
            return lam_eval_hist_step(hist, params, im, cls_label, gt, valid,
                                      ta, cfg, CANVAS, "training_free",
                                      class_slots=4)
        h = jax.block_until_ready(step(init_hist(cfg.num_classes)))
        r = benchmark(step, vary=lambda i: (init_hist(cfg.num_classes),),
                      iters=8)
        rec(f"lam_eval_hist_step B={b}", r["ms"], b)

    from excel_tpu.engine.evaluate import msc_hist_step
    SCALES = (1.0, 0.7, 1.2, 1.5)
    cfgs = tuple(dataclasses.replace(
        cfg, clip=dataclasses.replace(cfg.clip, image_size=int(320 * s)))
        for s in SCALES)
    mcanvas = (512, 512)
    for b in (8, 16):
        sized = tuple(jnp.asarray(rng.random((b, int(320 * s), int(320 * s),
                                              3)).astype(np.float32) * 255)
                      for s in SCALES)
        valid = jnp.asarray([[375, 500]] * b, jnp.int32)
        gt = jnp.zeros((b,) + mcanvas, jnp.int32)
        full = functools.partial(msc_hist_step, canvas=mcanvas, cfgs=cfgs,
                                 keep_flips=tuple(s != 1.0 for s in SCALES))
        h = jax.block_until_ready(full(init_hist(cfg.num_classes),
                                       full_params, sized, gt, valid, ta))
        r = benchmark(lambda hh, b=b, sized=sized, gt=gt, valid=valid:
                      full(hh, full_params, sized, gt, valid, ta),
                      vary=lambda i: (init_hist(cfg.num_classes),), iters=6)
        rec(f"msc_hist_step B={b}", r["ms"], b)


if __name__ == "__main__":
    main()
