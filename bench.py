"""Headline benchmark: training-free LAM pseudo-labels at label resolution.

Protocol-matched to the reference baseline (SURVEY.md §6: the in-training
validation sweep — surgery-CLIP forward at 320², SVC affinity refinement,
PAR and argmax at LABEL resolution — runs at ~10.6 img/s on an RTX 3090,
logs/voc_train.log). Here the whole per-image pipeline is one jitted,
batched program on one TPU chip, evaluated on a 512-canvas with per-image
valid extents (VOC-typical 375x500 labels).

All iterations are dispatched before a single device fetch: the tunnel's
per-fetch RPC latency (~25 ms in this environment) would otherwise dominate
and understate device throughput; a final reduction over every iteration's
output forces full execution of all of them.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_S = 10.6   # reference RTX 3090, logs/voc_train.log (SURVEY.md §6)
BATCH = int(os.environ.get("BENCH_BATCH", "16"))   # sweep knob; 16 = record
# the bucketed eval sweep routes a 375x500 landscape image (the median VOC
# shape) onto a 384x512 canvas (engine/evaluate._bucket_of)
CANVAS = (384, 512)
WARMUP = 2
ITERS = 12


def main():
    from excel_tpu.config import fast, voc_config
    from excel_tpu.models.params import init_clip_params

    # production fast path: bf16 encoder matmuls + fused surgery attention
    # + bf16 PAR diffusion (fp32 LayerNorm/softmax/accumulation)
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    from excel_tpu.models.params import cast_matmul_weights
    clip_params = cast_matmul_weights(init_clip_params(key, cfg.clip),
                                      jnp.bfloat16)
    params = {"clip": clip_params}
    rng = np.random.default_rng(0)
    size = cfg.clip.image_size
    batches = [jnp.asarray(rng.random((BATCH, size, size, 3))
                           .astype(np.float32) * 255) for _ in range(4)]
    cls_label = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_label[:, :3] = 1.0
    cls_label = jnp.asarray(cls_label)
    # VOC-typical landscape label extents (one canvas bucket's batch)
    sizes = [[375, 500], [333, 500], [375, 500], [334, 500],
             [375, 500], [360, 480], [375, 500], [342, 500]]
    valid = jnp.asarray((sizes * ((BATCH + 7) // 8))[:BATCH], jnp.int32)
    text_attr = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)

    # present-class slot bucket, as the eval sweeps pick it host-side
    # (engine/evaluate._slots_bucket): the reference refines present
    # classes only; 3 present classes here -> the 3-slot bucket.
    from excel_tpu.engine.evaluate import _slots_bucket
    slots = _slots_bucket(np.asarray(cls_label), cfg.num_fg)

    # the production sweep step (engine/evaluate.run_lam_eval): pipeline +
    # device-side confusion-hist update in ONE compiled program — its only
    # output is the [C, C] hist, so predictions never leave the device
    from excel_tpu.engine.evaluate import lam_eval_hist_step
    from excel_tpu.utils.metrics import init_hist
    gt = jnp.zeros((BATCH,) + CANVAS, jnp.int32)

    def step(hist, im):
        return lam_eval_hist_step(hist, params, im, cls_label, gt, valid,
                                  text_attr, cfg, CANVAS, "training_free",
                                  class_slots=slots)

    hist = init_hist(cfg.num_classes)
    for i in range(WARMUP):
        hist = step(hist, batches[i % len(batches)])
    float(hist.sum())

    # best of 3 windows: the chip is shared and run-to-run varies up to 2x
    # (CLAUDE.md) — the fastest window is the least-contended measurement
    windows = []
    for _ in range(3):
        hist = init_hist(cfg.num_classes)
        t0 = time.perf_counter()
        for i in range(ITERS):
            hist = step(hist, batches[i % len(batches)])
        float(hist.sum())  # one fetch forces every dispatched iteration
        windows.append(time.perf_counter() - t0)

    dt = min(windows)
    img_s = BATCH * ITERS / dt
    # measurement metadata (VERDICT r4 Weak #3): window img/s + spread make
    # the headline row self-describing — without them a BENCH_rN point value
    # can't be told apart from the documented +-40% shared-chip noise
    win_rates = [round(BATCH * ITERS / w, 1) for w in windows]
    print(json.dumps({
        "metric": "training_free_lam_label_res_img_per_s",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 2),
        "iters": ITERS,
        "windows": win_rates,
        "spread_pct": round(100 * (max(windows) - min(windows))
                            / min(windows), 1),
    }))


if __name__ == "__main__":
    main()
