"""Component breakdown of the headline LAM eval step on the real TPU.

Times each stage of the PRODUCTION pipeline (bench.py protocol: batch 16,
320px encoder, 384x512 canvas, bf16 fast path, present-class slot bucket —
engine/evaluate._pseudo_on_canvas) as a separately-jitted program so the
per-stage cost is visible, then the fused lam_eval_hist_step they compose
into. Dispatch-chained timing via utils/profiling.benchmark. Stage sums
exceed the fused step: each separate program pays its own dispatch +
HBM-boundary cost that XLA fuses away in the full program.

Env: BENCH_BATCH (default 16), EXCEL_SLOTS (default: production bucket of
the 3-present-class label, engine/evaluate._slots_bucket).
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
from excel_tpu.engine.evaluate import _slots_bucket, lam_eval_hist_step
from excel_tpu.engine.pipeline import attn_mode_for, normalize_images
from excel_tpu.models.clip import encode_image
from excel_tpu.models.excel import compute_lams
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.ops.affinity import refine_lams_batch
from excel_tpu.ops.labels import (argmax_label, cams_with_background_canvas,
                                  class_slot_index, slot_label_to_class,
                                  upscale_to_canvas_align)
from excel_tpu.ops.par import par_refine
from excel_tpu.utils.metrics import init_hist, update_hist
from excel_tpu.utils.profiling import benchmark

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
CANVAS = (384, 512)


def main():
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    params = {"clip": cast_matmul_weights(init_clip_params(key, cfg.clip),
                                          jnp.bfloat16)}
    rng = np.random.default_rng(0)
    size = cfg.clip.image_size
    images = jnp.asarray(rng.random((BATCH, size, size, 3), np.float32) * 255)
    cls_np = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_np[:, :3] = 1.0
    cls_label = jnp.asarray(cls_np)
    sizes = [[375, 500], [333, 500], [375, 500], [334, 500],
             [375, 500], [360, 480], [375, 500], [342, 500]]
    valid = jnp.asarray((sizes * ((BATCH + 7) // 8))[:BATCH], jnp.int32)
    text_attr = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)

    slots = int(os.environ.get("EXCEL_SLOTS",
                               _slots_bucket(cls_np, cfg.num_fg)))
    grid = size // cfg.clip.patch_size
    print(f"batch {BATCH}, slots {slots}, par_iters {cfg.refine.par_iters}, "
          f"canvas {CANVAS}")

    @jax.jit
    def stage_encode(p, im, ta):
        x = normalize_images(im)
        out = encode_image(p["clip"], x, cfg.clip,
                           attn_mode=attn_mode_for(cfg))
        lams = compute_lams(out, ta, cfg.num_fg)
        return lams, out["attn"], x.transpose(0, 3, 1, 2)

    lams, attn_w, nchw = jax.block_until_ready(
        stage_encode(params, images, text_attr))

    @jax.jit
    def stage_svc(lams, attn_w):
        cams = lams.transpose(0, 2, 1)                     # [B, C, hw]
        idx, smask = class_slot_index(cls_label, slots)
        cams = jnp.take_along_axis(cams, idx[:, :, None], axis=1)
        refined = refine_lams_batch(
            cams, attn_w, cfg.refine.caa_threshold, (grid, grid),
            attn_layers=cfg.refine.attn_layers, seg_attn=None)
        return refined, idx, smask

    refined, idx, smask = jax.block_until_ready(stage_svc(lams, attn_w))

    @jax.jit
    def stage_canvas(refined, nchw):
        cams = cams_with_background_canvas(
            refined.reshape(BATCH, -1, grid, grid), smask, valid, CANVAS)
        guide = upscale_to_canvas_align(nchw, valid, CANVAS)
        return cams, guide

    cams, guide = jax.block_until_ready(stage_canvas(refined, nchw))

    @jax.jit
    def stage_par(guide, cams):
        return par_refine(guide, cams,
                          dilations=tuple(cfg.refine.par_dilations),
                          num_iter=cfg.refine.par_iters, valid_hw=valid,
                          dtype=jnp.bfloat16 if cfg.refine.par_bf16 else None)

    par_out = jax.block_until_ready(stage_par(guide, cams))

    @jax.jit
    def stage_hist(hist, cams):
        slot = argmax_label(cams, smask, ignore_index=255)
        preds = slot_label_to_class(slot, idx)
        return update_hist(hist, gt, preds, cfg.num_classes)

    gt = jnp.zeros((BATCH,) + CANVAS, jnp.int32)
    hist0 = init_hist(cfg.num_classes)
    jax.block_until_ready(stage_hist(hist0, par_out))

    full = functools.partial(lam_eval_hist_step, cfg=cfg, canvas=CANVAS,
                             mode="training_free", class_slots=slots)
    jax.block_until_ready(
        full(init_hist(cfg.num_classes), params, images, cls_label, gt,
             valid, text_attr))

    results = {}
    results["encode+lam"] = benchmark(stage_encode, params, images,
                                      text_attr, iters=8)
    results["slots+svc"] = benchmark(stage_svc, lams, attn_w, iters=8)
    results["canvas_upscale"] = benchmark(stage_canvas, refined, nchw, iters=8)
    results["par"] = benchmark(stage_par, guide, cams, iters=8)
    results["argmax+hist"] = benchmark(stage_hist, hist0, par_out, iters=8)
    results["FULL hist_step"] = benchmark(
        lambda im: full(init_hist(cfg.num_classes), params, im, cls_label,
                        gt, valid, text_attr),
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
