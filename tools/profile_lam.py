"""Component breakdown of the headline LAM eval step on the real TPU.

Times each stage of lam_eval_step (bench.py protocol: batch 16, 320px
encoder, 384x512 canvas, bf16 fast path) as a separately-jitted program so
the per-stage cost is visible. Dispatch-chained timing via
utils/profiling.benchmark.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import fast, voc_config
from excel_tpu.engine.evaluate import lam_eval_step
from excel_tpu.engine.pipeline import normalize_images
from excel_tpu.models.clip import encode_image
from excel_tpu.models.excel import compute_lams
from excel_tpu.models.params import init_clip_params
from excel_tpu.ops.affinity import refine_lams_batch
from excel_tpu.ops.labels import (argmax_label, cams_with_background_canvas,
                                  upscale_to_canvas_align)
from excel_tpu.ops.par import par_refine
from excel_tpu.utils.profiling import benchmark

BATCH = 16
CANVAS = (384, 512)


def main():
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    params = {"clip": init_clip_params(key, cfg.clip)}
    rng = np.random.default_rng(0)
    size = cfg.clip.image_size
    images = jnp.asarray(rng.random((BATCH, size, size, 3), np.float32) * 255)
    cls_label = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_label[:, :3] = 1.0
    cls_label = jnp.asarray(cls_label)
    sizes = [[375, 500], [333, 500], [375, 500], [334, 500],
             [375, 500], [360, 480], [375, 500], [342, 500]]
    valid = jnp.asarray((sizes * 2)[:BATCH], jnp.int32)
    text_attr = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)

    grid = size // cfg.clip.patch_size

    @jax.jit
    def stage_encode(p, im, ta):
        x = normalize_images(im)
        out = encode_image(p["clip"], x, cfg.clip)
        lams = compute_lams(out, ta, cfg.num_fg)
        return lams, out["attn"], x.transpose(0, 3, 1, 2)

    lams, attn_w, nchw = jax.block_until_ready(
        stage_encode(params, images, text_attr))

    @jax.jit
    def stage_svc(lams, attn_w):
        return refine_lams_batch(
            lams.transpose(0, 2, 1), attn_w, cfg.refine.caa_threshold,
            (grid, grid), attn_layers=cfg.refine.attn_layers, seg_attn=None)

    refined = jax.block_until_ready(stage_svc(lams, attn_w))
    b, c, _ = refined.shape[0], refined.shape[1], None

    @jax.jit
    def stage_canvas(refined, nchw):
        cams = cams_with_background_canvas(
            refined.reshape(BATCH, -1, grid, grid), cls_label, valid, CANVAS)
        guide = upscale_to_canvas_align(nchw, valid, CANVAS)
        return cams, guide

    cams, guide = jax.block_until_ready(stage_canvas(refined, nchw))

    @jax.jit
    def stage_par(guide, cams):
        return par_refine(guide, cams, dilations=tuple(cfg.refine.par_dilations),
                          num_iter=cfg.refine.par_iters, valid_hw=valid,
                          dtype=jnp.bfloat16 if cfg.refine.par_bf16 else None)

    par_out = jax.block_until_ready(stage_par(guide, cams))

    @jax.jit
    def stage_argmax(cams):
        return argmax_label(cams, cls_label, ignore_index=255)

    jax.block_until_ready(stage_argmax(par_out))

    full = functools.partial(lam_eval_step, cfg=cfg, canvas=CANVAS,
                             mode="training_free")
    jax.block_until_ready(
        full(params, images, cls_label, valid, text_attr))

    results = {}
    results["encode+lam"] = benchmark(stage_encode, params, images,
                                      text_attr, iters=8)
    results["svc"] = benchmark(stage_svc, lams, attn_w, iters=8)
    results["canvas_upscale"] = benchmark(stage_canvas, refined, nchw, iters=8)
    results["par"] = benchmark(stage_par, guide, cams, iters=8)
    results["argmax"] = benchmark(stage_argmax, par_out, iters=8)
    results["FULL lam_eval_step"] = benchmark(
        lambda im: full(params, im, cls_label, valid, text_attr),
        images, iters=8)

    total = 0.0
    for name, r in results.items():
        if not name.startswith("FULL"):
            total += r["ms"]
        print(f"{name:24s} {r['ms']:8.2f} ms  "
              f"({BATCH / (r['ms'] / 1e3):7.1f} img/s)")
    print(f"{'sum of stages':24s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
