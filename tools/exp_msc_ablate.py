"""In-program ablation of the MSC+flip seg-eval step (VOC or COCO).

Same methodology as tools/exp_lam_ablate.py: per-stage cost comes from
DIFFERENCING fully-fused variants of the msc_hist_step pipeline (separately
jitted stage timers are floored by the tunnel's ~5-6 ms dispatch overhead).

Variants:
  full       4 scales x flip fusion -> canvas upscale-sum -> argmax -> hist
  nohist     hist replaced by preds.sum()        full - nohist  = hist
  enc_fused  flip-fused grid logits only (no upscale/argmax/hist)
             nohist - enc_fused = canvas upscale + argmax
  crf        full + on-TPU CRF                   crf - full     = CRF

Env: DATASET=voc|coco, BENCH_BATCH (default 8 voc / 4 coco).
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import coco_config, fast, voc_config
from excel_tpu.engine.evaluate import canvas_argmax, seg_grid_logits
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.ops.labels import upscale_to_canvas
from excel_tpu.utils.metrics import init_hist, update_hist
from excel_tpu.utils.profiling import benchmark

DATASET = os.environ.get("DATASET", "voc")
CANVAS = (480, 640) if DATASET == "coco" else (384, 512)
SCALES = (1.0, 0.7, 1.2, 1.5)


def main():
    cfg = fast(coco_config() if DATASET == "coco" else voc_config())
    batch = int(os.environ.get("BENCH_BATCH",
                               "4" if DATASET == "coco" else "8"))
    key = jax.random.PRNGKey(0)
    clip_params = cast_matmul_weights(init_clip_params(key, cfg.clip),
                                      jnp.bfloat16)
    params = init_excel_params(key, cfg, clip_params)
    rng = np.random.default_rng(0)
    base = cfg.clip.image_size
    cfgs = tuple(dataclasses.replace(
        cfg, clip=dataclasses.replace(cfg.clip, image_size=int(base * s)))
        for s in SCALES)
    sized = tuple(jnp.asarray(rng.random(
        (batch, int(base * s), int(base * s), 3)).astype(np.float32) * 255)
        for s in SCALES)
    vh = CANVAS[0] if DATASET != "coco" else 480
    valid = jnp.asarray([[min(vh, 375) if DATASET == "voc" else vh,
                          CANVAS[1]]] * batch, jnp.int32)
    n_bg = 23 if DATASET == "coco" else 25
    ta = jax.random.normal(key, (cfg.num_fg + n_bg, cfg.clip.embed_dim))
    ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)
    gt = jnp.zeros((batch,) + CANVAS, jnp.int32)
    keep = tuple(s != 1.0 for s in SCALES)
    print(f"{DATASET}: batch {batch}, canvas {CANVAS}, "
          f"C {cfg.num_classes}, scales {SCALES}")

    def pipeline(scale_images, upscale: bool, hist: bool, crf: bool):
        acc = jnp.zeros((batch, cfg.num_classes, *CANVAS), jnp.float32)
        flat = jnp.float32(0)
        for imgs, c, kf in zip(scale_images, cfgs, keep):
            if kf:
                cat = jnp.concatenate([imgs, imgs[:, :, ::-1, :]], axis=0)
                lg = seg_grid_logits(params, cat, ta, c)
                fused = (lg[:batch] + lg[batch:, :, :, ::-1]) / 2.0
            else:
                fused = seg_grid_logits(params, imgs, ta, c)
            if upscale:
                acc = acc + upscale_to_canvas(fused, valid, CANVAS)
            else:
                flat = flat + fused.sum()
        if not upscale:
            return flat
        if crf:
            from excel_tpu.ops.crf_tpu import crf_meanfield_cfg
            ci = jnp.zeros((batch, *CANVAS, 3), jnp.uint8)
            acc = crf_meanfield_cfg(ci, jax.nn.softmax(acc, axis=1),
                                    cfg.crf, valid_hw=valid)
        preds = canvas_argmax(acc)
        if hist:
            return update_hist(init_hist(cfg.num_classes), gt, preds,
                               cfg.num_classes)
        return preds.sum()

    variants = {
        "full": jax.jit(lambda *im: pipeline(im, True, True, False)),
        "nohist": jax.jit(lambda *im: pipeline(im, True, False, False)),
        "enc_fused": jax.jit(lambda *im: pipeline(im, False, False, False)),
        "crf": jax.jit(lambda *im: pipeline(im, True, True, True)),
    }
    only = os.environ.get("VARIANTS")
    if only:
        ks = set(only.split(","))
        variants = {k: v for k, v in variants.items() if k in ks}
    res = {}
    warm = {}
    for name, fn in variants.items():
        try:
            jax.block_until_ready(fn(*sized))
            warm[name] = fn
        except Exception as e:     # one variant must not kill the run
            print(f"{name:10s} FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)
    for name, fn in warm.items():
        res[name] = benchmark(fn, *sized, iters=6)["ms"]
        print(f"{name:10s} {res[name]:8.2f} ms "
              f"({1000 * batch / res[name]:6.1f} img/s)", flush=True)
    f = res.get("full")
    if f is None:
        return
    print(f"\nderived (of {f:.2f} ms full):")
    if "nohist" in res:
        print(f"  hist update      {f - res['nohist']:8.2f} ms")
    if "enc_fused" in res and "nohist" in res:
        print(f"  upscale+argmax   {res['nohist'] - res['enc_fused']:8.2f} ms")
    if "enc_fused" in res:
        print(f"  encoders (fused) {res['enc_fused']:8.2f} ms (standalone)")
    if "crf" in res:
        print(f"  on-TPU CRF       {res['crf'] - f:8.2f} ms")


if __name__ == "__main__":
    main()
