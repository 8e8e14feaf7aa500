"""Stage attribution of the BENCH-exact training-free step (slots=4, bf16).

bench.py's protocol: B=16, 320px encoder, 384x512 canvas, 4-slot class
compaction, bf16 fast path, fused hist. Stages are jitted separately and
timed with dispatch-chained iterations; their sum exceeds the fused full
step (XLA fuses across stage boundaries) but the ratios show where the
time goes.
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

BATCH = 16
CANVAS = (384, 512)


def main():
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    params = {"clip": cast_matmul_weights(init_clip_params(key, cfg.clip),
                                          jnp.bfloat16)}
    rng = np.random.default_rng(0)
    size = cfg.clip.image_size
    images_u8 = jnp.asarray(rng.random((BATCH, size, size, 3),
                                       np.float32) * 255)
    cls_label = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_label[:, :3] = 1.0
    cls_label = jnp.asarray(cls_label)
    sizes = [[375, 500], [333, 500], [375, 500], [334, 500],
             [375, 500], [360, 480], [375, 500], [342, 500]]
    valid = jnp.asarray((sizes * 2)[:BATCH], jnp.int32)
    ta = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)
    slots = _slots_bucket(np.asarray(cls_label), cfg.num_fg)
    gt = jnp.zeros((BATCH,) + CANVAS, jnp.int32)

    def rec(name, ms):
        ms = ms["ms"] if isinstance(ms, dict) else ms
        print(f"{name:26s} {ms:8.2f} ms  ({BATCH / (ms / 1e3):7.1f} img/s)",
              flush=True)

    # stage 1: encoder (+ in-kernel attn mean) + LAM similarity
    @jax.jit
    def s1(params, images_u8, ta):
        images = normalize_images(images_u8)
        out = encode_image(params["clip"], images, cfg.clip,
                           attn_mode=attn_mode_for(cfg))
        return compute_lams(out, ta, cfg.num_fg), out["attn"]

    (lams, attn_w) = s1(params, images_u8, ta)
    jax.block_until_ready(lams)
    rec("encode+lam", benchmark(lambda: s1(params, images_u8, ta)[0]))

    # stage 2: slot compaction + SVC refine
    grid = int(round(lams.shape[1] ** 0.5))

    @jax.jit
    def s2(lams, attn_w, cls_label):
        l = lams.transpose(0, 2, 1)
        idx, smask = class_slot_index(cls_label, slots)
        l = jnp.take_along_axis(l, idx[:, :, None], axis=1)
        refined = refine_lams_batch(l, attn_w, cfg.refine.caa_threshold,
                                    (grid, grid),
                                    attn_layers=cfg.refine.attn_layers,
                                    seg_attn=None)
        return refined, idx, smask

    refined, idx, smask = s2(lams, attn_w, cls_label)
    jax.block_until_ready(refined)
    rec("svc refine", benchmark(lambda: s2(lams, attn_w, cls_label)[0]))

    # stage 3: +bg canvas upscale (cams + guidance)
    @jax.jit
    def s3(refined, smask, valid, images_u8):
        b = refined.shape[0]
        cams = cams_with_background_canvas(
            refined.reshape(b, -1, grid, grid), smask, valid, CANVAS)
        nchw = normalize_images(images_u8).transpose(0, 3, 1, 2)
        guide = upscale_to_canvas_align(nchw, valid, CANVAS)
        return cams, guide

    cams, guide = s3(refined, smask, valid, images_u8)
    jax.block_until_ready(cams)
    rec("canvas upscale", benchmark(
        lambda: s3(refined, smask, valid, images_u8)[0]))

    # stage 4: PAR
    par = jax.jit(functools.partial(
        par_refine, dilations=tuple(cfg.refine.par_dilations),
        num_iter=cfg.refine.par_iters, dtype=jnp.bfloat16))
    out = par(guide, cams, valid_hw=valid)
    jax.block_until_ready(out)
    rec("par", benchmark(lambda: par(guide, cams, valid_hw=valid)))

    # stage 5: argmax + slot->class + hist
    @jax.jit
    def s5(hist, out, smask, idx, gt):
        slot = argmax_label(out, smask, ignore_index=cfg.refine.ignore_index)
        preds = slot_label_to_class(slot, idx)
        return update_hist(hist, gt, preds, cfg.num_classes)

    hist = init_hist(cfg.num_classes)
    h = s5(hist, out, smask, idx, gt)
    jax.block_until_ready(h)
    rec("argmax+hist", benchmark(lambda: s5(hist, out, smask, idx, gt)))

    # full fused step (bench.py protocol)
    def full(hist):
        return lam_eval_hist_step(hist, params, images_u8, cls_label, gt,
                                  valid, ta, cfg, CANVAS, "training_free",
                                  class_slots=slots)

    h = full(init_hist(cfg.num_classes))
    jax.block_until_ready(h)
    ms = benchmark(lambda: full(init_hist(cfg.num_classes)))
    rec("FULL fused step", ms)


if __name__ == "__main__":
    main()
