"""Quantify the tunnel's per-program-dispatch gap on the headline LAM step.

bench.py dispatches ITERS separate executions of lam_eval_hist_step and
fetches once. If the tunnel serializes executions with a fixed per-program
gap (suspected ~5-6 ms: separately-jitted stage timings all floor there),
then per-step time = device_time + gap, and a real TPU-VM host (~50 us
dispatch) would run the same sweep at device_time.

Measured here by comparing:
  a) 12 x dispatch of the single-step program        (bench.py protocol)
  b) 3 x dispatch of a program scanning 4 chained steps
  c) 1 x dispatch of a program scanning 12 chained steps
The scan body is the IDENTICAL pipeline (one trace); image batches differ
per scan iteration so XLA cannot collapse the steps. gap ~= a - c per step.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
CANVAS = (384, 512)


def main():
    from excel_tpu.config import fast, voc_config
    from excel_tpu.engine.evaluate import _slots_bucket, lam_eval_hist_step
    from excel_tpu.models.params import cast_matmul_weights, init_clip_params
    from excel_tpu.utils.metrics import init_hist

    cfg = fast(voc_config())
    key = jax.random.PRNGKey(0)
    params = {"clip": cast_matmul_weights(init_clip_params(key, cfg.clip),
                                          jnp.bfloat16)}
    rng = np.random.default_rng(0)
    size = cfg.clip.image_size
    stack = jnp.asarray(rng.random((12, BATCH, size, size, 3))
                        .astype(np.float32) * 255)
    cls_np = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_np[:, :3] = 1.0
    cls_label = jnp.asarray(cls_np)
    sizes = [[375, 500], [333, 500], [375, 500], [334, 500],
             [375, 500], [360, 480], [375, 500], [342, 500]]
    valid = jnp.asarray((sizes * ((BATCH + 7) // 8))[:BATCH], jnp.int32)
    text_attr = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)
    gt = jnp.zeros((BATCH,) + CANVAS, jnp.int32)
    slots = _slots_bucket(cls_np, cfg.num_fg)

    def step(hist, im):
        return lam_eval_hist_step(hist, params, im, cls_label, gt, valid,
                                  text_attr, cfg, CANVAS, "training_free",
                                  class_slots=slots)

    def make_scan(k):
        @jax.jit
        def prog(hist, ims):          # ims [k, B, ...]
            def body(h, im):
                return step(h, im), 0
            h, _ = jax.lax.scan(body, hist, ims)
            return h
        return prog

    scan4, scan12 = make_scan(4), make_scan(12)

    def run(label, fn_calls):
        # warmup
        h = init_hist(cfg.num_classes)
        for call in fn_calls:
            h = call(h)
        float(h.sum())
        best = float("inf")
        for _ in range(3):
            h = init_hist(cfg.num_classes)
            t0 = time.perf_counter()
            for call in fn_calls:
                h = call(h)
            float(h.sum())
            best = min(best, time.perf_counter() - t0)
        ms = best / 12 * 1e3
        print(f"{label:28s} {ms:8.2f} ms/step  ({BATCH * 12 / best:6.1f}"
              f" img/s)", flush=True)
        return ms

    a = run("12 x single-step dispatch",
            [lambda h, i=i: step(h, stack[i]) for i in range(12)])
    b = run("3 x scan(4 steps)",
            [lambda h, i=i: scan4(h, stack[4 * i:4 * i + 4])
             for i in range(3)])
    c = run("1 x scan(12 steps)", [lambda h: scan12(h, stack)])
    print(f"\nper-dispatch gap ~= {a - c:.2f} ms "
          f"(scan4 implies {(a - b) * 4 / 3:.2f})")


if __name__ == "__main__":
    main()
