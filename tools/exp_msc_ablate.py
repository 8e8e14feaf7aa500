"""In-program ablation of the MSC+flip seg step on the real TPU.

Same differencing technique as exp_lam_ablate.py: each variant is the
complete fused msc_hist_step with one scale dropped (or the hist swapped
for a sum), so the tunnel's per-dispatch floor cancels in the subtraction
and the remainder is honest per-scale cost (encoder fwd + flip fuse +
canvas upscale + accumulate).

Protocol matches tools/bench_msc.py: scales 320x(1.0, 0.7, 1.2, 1.5) ->
401/197/577/901 tokens, flip on all but 1.0, 512x512 canvas, B=8
(flip pairs run the encoder at B=16).
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import fast, voc_config
from excel_tpu.engine.evaluate import msc_hist_step
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.metrics import init_hist

B = int(os.environ.get("BENCH_BATCH", "8"))
CANVAS = (512, 512)
SCALES = (1.0, 0.7, 1.2, 1.5)


def main():
    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    clip_params = cast_matmul_weights(init_clip_params(key, cfg.clip),
                                      jnp.bfloat16)
    params = init_excel_params(key, cfg, clip_params)
    rng = np.random.default_rng(0)
    ta = jax.random.normal(key, (45, 512))
    ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)
    valid = jnp.asarray([[375, 500]] * B, jnp.int32)
    gt = jnp.zeros((B,) + CANVAS, jnp.int32)

    def build(scales):
        cfgs = tuple(dataclasses.replace(
            cfg, clip=dataclasses.replace(cfg.clip, image_size=int(320 * s)))
            for s in scales)
        sized = tuple(jnp.asarray(
            rng.random((B, int(320 * s), int(320 * s), 3))
            .astype(np.float32) * 255) for s in scales)
        kf = tuple(s != 1.0 for s in scales)

        def step(hist):
            return msc_hist_step(hist, params, sized, gt, valid, ta, cfgs,
                                 CANVAS, kf)
        return step

    variants = {"full": build(SCALES)}
    for drop in SCALES:
        variants[f"no_{drop}"] = build(tuple(s for s in SCALES if s != drop))

    def timeit(fn, iters=6):
        # msc_hist_step donates the hist, so chain it through the iterations
        # and fetch ONE scalar at the end (tunnel-correct timing — see
        # utils/profiling.benchmark's docstring)
        import time
        h = fn(init_hist(cfg.num_classes))
        float(h.sum())                       # warmup + compile barrier
        h = init_hist(cfg.num_classes)
        t0 = time.perf_counter()
        for _ in range(iters):
            h = fn(h)
        float(h.sum())
        return (time.perf_counter() - t0) / iters * 1e3

    res = {}
    for name, fn in variants.items():
        res[name] = min(timeit(fn), timeit(fn))
        print(f"{name:10s} {res[name]:8.2f} ms", flush=True)

    f = res["full"]
    print(f"\nderived (of {f:.2f} ms full, B={B}, {B*1000/f:.1f} img/s):")
    toks = {1.0: 401, 0.7: 197, 1.2: 577, 1.5: 901}
    for drop in SCALES:
        cost = f - res[f"no_{drop}"]
        eb = B if drop == 1.0 else 2 * B
        print(f"  scale {drop} ({toks[drop]} tok, enc B={eb})"
              f"  {cost:8.2f} ms  ({100*cost/f:4.1f}%)")


if __name__ == "__main__":
    main()
