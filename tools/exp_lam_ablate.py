"""In-program ablation of the headline LAM hist step on the real TPU.

Separately-jitted stage timings are floored by the tunnel's ~5-6 ms
per-dispatch overhead (a lone final-matmul program measured the same as the
whole fused pipeline — see CLAUDE.md round-3 notes), so per-stage cost is
measured here by
DIFFERENCING fully-fused program variants: each variant is the complete
bench.py pipeline with one stage removed or reduced. The dispatch floor is
identical across variants and cancels in the subtraction.

Variants:
  full       encode -> slots -> SVC -> canvas -> PAR(20) -> argmax+hist
  par1       PAR runs 1 iteration        (full - par1)/19*20 = diffusion
  nopar      PAR skipped entirely        full - nopar = PAR incl. affinity
  nosvc      trans_mat/box-mask skipped  full - nosvc = SVC
  nohist     hist replaced by preds.sum  full - nohist = one-hot hist
  enconly    encode+lam only             lower bound of the encoder share

Env knobs: DATASET=voc|coco (coco: 81 classes, 512x640 canvas, 5-class
images -> the 8-slot bucket, matching bench_suite's coco LAM row),
BENCH_BATCH, NCLS (present classes per image — sweeps the slot-bucket
axis), SLOTS (override the bucket directly).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import coco_config, fast, voc_config
from excel_tpu.engine.evaluate import _slots_bucket
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
DATASET = os.environ.get("DATASET", "voc")
# coco canvas: the production bucket for 449-480-row landscape images
# (engine/evaluate._bucket_of quantizes H to 64 since r4)
CANVAS = (480, 640) if DATASET == "coco" else (384, 512)


def main():
    cfg = fast(coco_config() if DATASET == "coco" else voc_config())
    key = jax.random.PRNGKey(0)
    params = {"clip": cast_matmul_weights(init_clip_params(key, cfg.clip),
                                          jnp.bfloat16)}
    rng = np.random.default_rng(0)
    size = cfg.clip.image_size
    images = jnp.asarray(rng.random((BATCH, size, size, 3), np.float32) * 255)
    ncls = int(os.environ.get("NCLS", "5" if DATASET == "coco" else "3"))
    cls_np = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_np[:, :ncls] = 1.0
    cls_label = jnp.asarray(cls_np)
    if DATASET == "coco":
        # COCO-typical landscape extents on the 480x640 bucket (449-480
        # rows; 427-row images land in their own 448-row bucket now)
        sizes = [[480, 640], [464, 640], [480, 640], [478, 640],
                 [480, 640], [459, 640], [480, 640], [466, 640]]
        n_bg = 23
    else:
        sizes = [[375, 500], [333, 500], [375, 500], [334, 500],
                 [375, 500], [360, 480], [375, 500], [342, 500]]
        n_bg = 25
    valid = jnp.asarray((sizes * ((BATCH + 7) // 8))[:BATCH], jnp.int32)
    text_attr = jax.random.normal(key,
                                  (cfg.num_fg + n_bg, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)
    gt = jnp.zeros((BATCH,) + CANVAS, jnp.int32)
    slots = int(os.environ.get(
        "SLOTS", _slots_bucket(cls_np, cfg.num_fg, cfg.refine.slot_buckets)))
    grid = size // cfg.clip.patch_size
    print(f"{DATASET}: batch {BATCH}, ncls {ncls}, slots {slots}, "
          f"canvas {CANVAS}, par_iters {cfg.refine.par_iters}")

    def pipeline(im, par_iters: int, svc: bool, hist: bool,
                 upscale: bool = True):
        x = normalize_images(im)
        out = encode_image(params["clip"], x, cfg.clip,
                           attn_mode=attn_mode_for(cfg))
        lams = compute_lams(out, text_attr, cfg.num_fg)
        cams = lams.transpose(0, 2, 1)
        idx, smask = class_slot_index(cls_label, slots)
        cams = jnp.take_along_axis(cams, idx[:, :, None], axis=1)
        if svc:
            cams = refine_lams_batch(
                cams, out["attn"], cfg.refine.caa_threshold, (grid, grid),
                attn_layers=cfg.refine.attn_layers, seg_attn=None)
        cams = cams_with_background_canvas(
            cams.reshape(BATCH, -1, grid, grid), smask, valid, CANVAS)
        if par_iters:
            if upscale:
                guide = upscale_to_canvas_align(
                    x.transpose(0, 3, 1, 2), valid, CANVAS)
            else:
                guide = jnp.zeros((BATCH, 3) + CANVAS, x.dtype)
            cams = par_refine(
                guide, cams, dilations=tuple(cfg.refine.par_dilations),
                num_iter=par_iters, valid_hw=valid,
                dtype=jnp.bfloat16 if cfg.refine.par_bf16 else None)
        slot = argmax_label(cams, smask, ignore_index=255)
        preds = slot_label_to_class(slot, idx)
        if hist:
            return update_hist(init_hist(cfg.num_classes), gt, preds,
                               cfg.num_classes)
        return preds.sum()

    def enconly(im):
        x = normalize_images(im)
        out = encode_image(params["clip"], x, cfg.clip,
                           attn_mode=attn_mode_for(cfg))
        lams = compute_lams(out, text_attr, cfg.num_fg)
        return (lams.astype(jnp.float32).sum()
                + out["attn"].astype(jnp.float32).sum())

    variants = {
        "full": jax.jit(lambda im: pipeline(im, cfg.refine.par_iters,
                                            True, True)),
        "par1": jax.jit(lambda im: pipeline(im, 1, True, True)),
        "nopar": jax.jit(lambda im: pipeline(im, 0, True, True)),
        "nosvc": jax.jit(lambda im: pipeline(im, cfg.refine.par_iters,
                                             False, True)),
        "nohist": jax.jit(lambda im: pipeline(im, cfg.refine.par_iters,
                                              True, False)),
        "noupscale": jax.jit(lambda im: pipeline(im, cfg.refine.par_iters,
                                                 True, True, upscale=False)),
        "noaff": jax.jit(lambda im: pipeline(im, cfg.refine.par_iters,
                                             True, True)),
        "enconly": jax.jit(enconly),
    }
    only = os.environ.get("VARIANTS")
    if only:
        keep = set(only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    # "noaff" swaps the Pallas affinity kernel for a constant uniform
    # affinity DURING ITS TRACE ONLY (par_refine resolves par_affinity from
    # the module at trace time), isolating the kernel's own cost from the
    # rest of the PAR build. par_refine is itself jitted and its trace
    # cache keys only on shapes/statics — identical across variants — so
    # the cache must be cleared around the swap or every other variant
    # silently reuses the const-affinity jaxpr (this corrupted the first
    # round-3 ablation run: "affinity kernel -0.31 ms").
    if "noaff" in variants:
        from excel_tpu.ops import par as par_mod
        import excel_tpu.ops.par_pallas as par_pallas
        real_aff = par_pallas.par_affinity

        def const_aff(img_padded, offsets, pos_w, h, w, **kw):
            k = len(offsets)
            return jnp.full((img_padded.shape[0], k, h, w), 1.0 / k,
                            kw.get("out_dtype", jnp.bfloat16))

        par_mod.par_refine.clear_cache()
        par_pallas.par_affinity = const_aff
        try:
            jax.block_until_ready(variants["noaff"](images))
        finally:
            par_pallas.par_affinity = real_aff
            par_mod.par_refine.clear_cache()

    res = {}
    for name, fn in variants.items():
        jax.block_until_ready(fn(images))
    for name, fn in variants.items():
        res[name] = benchmark(fn, images, iters=8)["ms"]
        print(f"{name:10s} {res[name]:8.2f} ms", flush=True)

    f = res.get("full")
    if f is None:
        return
    print(f"\nderived (of {f:.2f} ms full):")
    if "nopar" in res:
        print(f"  PAR total       {f - res['nopar']:8.2f} ms")
    if "par1" in res:
        print(f"  PAR diffusion   {(f - res['par1']) / 19 * 20:8.2f} ms")
    if "par1" in res and "nopar" in res:
        print(f"  PAR build+1it   {res['par1'] - res['nopar']:8.2f} ms")
    if "noaff" in res:
        print(f"  affinity kernel {f - res['noaff']:8.2f} ms")
    if "noupscale" in res:
        print(f"  guide upscale   {f - res['noupscale']:8.2f} ms")
    if "nosvc" in res:
        print(f"  SVC             {f - res['nosvc']:8.2f} ms")
    if "nohist" in res:
        print(f"  hist update     {f - res['nohist']:8.2f} ms")
    if "enconly" in res:
        print(f"  encode+lam      {res['enconly']:8.2f} ms (standalone, "
              f"incl. dispatch floor)")


if __name__ == "__main__":
    main()
