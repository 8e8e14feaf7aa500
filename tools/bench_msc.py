"""MSC+flip seg-eval bench: one JSON line, best-of-3 windows.

The production fused sweep step (engine/evaluate.msc_hist_step): 4 scales
x flip (scale 1.0 keeps only the unflipped half), argmax + confusion hist
in ONE compiled program per batch; only the [C, C] hist is fetched.
Honors BENCH_BATCH.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", "8"))
# the bucketed eval sweep routes a 375x500 label onto a 384x512 canvas
# (engine/evaluate._bucket_of) — same bucket bench.py times
CANVAS = (384, 512)
SCALES = (1.0, 0.7, 1.2, 1.5)
BASELINE_IMG_S = 3.0   # reference MSC+flip _validate, batch 1 (BASELINE.md)


def main():
    from excel_tpu.config import fast, voc_config
    from excel_tpu.engine.evaluate import msc_hist_step
    from excel_tpu.models.excel import init_excel_params
    from excel_tpu.models.params import cast_matmul_weights, init_clip_params
    from excel_tpu.utils.metrics import init_hist

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

    def msc(hist):
        return msc_hist_step(hist, params, sized, gt, valid, ta, cfgs,
                             CANVAS, kf)

    h = init_hist(21)
    for _ in range(2):
        h = msc(h)
    float(h.sum())
    best = float("inf")
    for _ in range(3):
        h = init_hist(21)
        t0 = time.perf_counter()
        for _ in range(4):
            h = msc(h)
        float(h.sum())
        best = min(best, (time.perf_counter() - t0) / 4)
    img_s = B / best
    print(json.dumps({
        "metric": "msc_flip_seg_img_per_s",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()
