"""Headline benchmark: training-free LAM pseudo-label throughput.

Workload = the reference's in-training validation sweep per image (surgery-
CLIP forward + SVC affinity refinement + PAR + argmax label at 320px,
SURVEY.md §6: ~10.6 img/s on an RTX 3090, logs/voc_train.log). Here the
whole pipeline is one jitted batched program on one TPU chip.

All iterations are dispatched before a single device fetch: the tunnel's
per-fetch RPC latency (~25 ms in this environment) would otherwise dominate
and understate device throughput; a final reduction over every iteration's
output forces full execution of all of them.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_S = 10.6   # reference RTX 3090, logs/voc_train.log (SURVEY.md §6)
BATCH = 32
WARMUP = 2
ITERS = 8


def main():
    from excel_tpu.config import fast, voc_config
    from excel_tpu.engine.pipeline import training_free_step
    from excel_tpu.models.params import init_clip_params

    # production fast path: bf16 encoder matmuls + bf16 PAR diffusion
    # (fp32 LayerNorm/softmax/accumulation; LAM corr vs fp32 > 0.9999)
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    rng = np.random.default_rng(0)
    size = cfg.clip.image_size
    batches = [jnp.asarray(rng.integers(0, 256, (BATCH, size, size, 3),
                                        dtype=np.uint8))
               for _ in range(4)]
    cls_label = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_label[:, :3] = 1.0
    cls_label = jnp.asarray(cls_label)
    text_attr = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)

    for i in range(WARMUP):
        out = training_free_step(clip_params, batches[i % len(batches)],
                                 cls_label, text_attr, cfg)
    float(out.sum())

    t0 = time.perf_counter()
    acc = jnp.int64(0) if jax.config.jax_enable_x64 else jnp.int32(0)
    for i in range(ITERS):
        out = training_free_step(clip_params, batches[i % len(batches)],
                                 cls_label, text_attr, cfg)
        acc = acc + out.sum()
    float(acc)  # one fetch forces every dispatched iteration
    dt = time.perf_counter() - t0

    img_s = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "training_free_lam_img_per_s",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()
