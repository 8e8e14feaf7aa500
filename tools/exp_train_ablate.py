"""In-program ablation of the TRAIN step on the real TPU.

Completes the per-protocol attribution set (exp_lam_ablate covers the LAM
eval protocols, exp_msc_ablate the MSC sweeps): where do the train step's
milliseconds go? Methodology as in r3 (CLAUDE.md): separately-jitted stage
timers are floored by the tunnel's ~5-6 ms dispatch overhead, so each
variant below is the COMPLETE compiled train step with one stage removed or
reduced, and per-stage cost is the difference of interleaved best-of-W
medians. Stages are removed by config (par_iters) or by monkeypatching the
module globals `engine.train.pseudo_labels` / `aff_loss` / `affinity_label`
BEFORE compiling that variant's fresh jit (each variant compiles its own
program; nothing shares traced jaxprs with a patched one).

Variants (production phase: calibrated + seg_affinity, the post-24k
configuration that bench_suite times):
  full      the real step: dual-pass encoder + pseudo-labels (SVC+PAR) +
            seg/aff losses + backward + AdamW
  par1      PAR runs 1 iteration   -> (full - par1) * iters/(iters-1) = PAR
  nopseudo  pseudo_labels replaced by a constant label map
            -> full - nopseudo = the whole pseudo-label pipeline
            (slot gather + SVC + bg/canvas + PAR + argmax)
  uncal     calibrated=False: single encoder pass, no ex_feats recompute
            -> full - uncal ~= the second (calibrated) encoder+LAM pass
  noaff     affinity_label + aff_loss stubbed to zeros
            -> full - noaff = affinity-label build + loss (+ its backward)

Backward share: gradients flow only into the ~6M-param head (the frozen
CLIP is never a differentiated input, engine/train.py:17-18), so the
backward program is the head-decoder's transpose only — too small to
warrant a variant; the residual after the stages above bounds it.

Usage: python tools/exp_train_ablate.py          (needs the real TPU)
Env: DATASET=voc|coco, BATCH (default 32), ITERS (default 8), WINDOWS
(default 3), NCLS (present classes/image, default 3 voc / 5 coco),
SLOTS (class-slot bucket; default = TrainStepCache's choice).

MEASURED (v5e, 2026-08-19/20):
- VOC B=32 ncls=3 slots=4 (two independent runs): full step 96.9/97.1 ms
  = 330 img/s in-program (bench_suite's 343 img/s row is the same step;
  delta = chip noise). Decomposition: pseudo-label pipeline 42.3/42.7 ms
  (44% — PAR diffusion 21.1 of it, affinity build + SVC + slot/canvas ops
  the rest), calibrated second encoder pass 15.5 ms, affinity label +
  loss ~0.3 ms, leaving ~39 ms for the first encoder pass + LVC head +
  backward + AdamW (grads only reach the 6M-param head).
- COCO B=32 ncls=5 slots=8: BEFORE the full-extent PAR routing 146.2 ms
  (219 img/s; diffusion 57.6 — the 9-channel stack shrinks the per-iter
  kernel's row tiles), AFTER 127.8 ms = 250 img/s (diffusion 40.0,
  pseudo pipeline 64.2, second pass 15.6). The routing change (ops/par.py:
  synthesize full extents -> resident kernel + channel groups) is
  bit-identical and neutral at VOC's C=5 (97.08 vs 96.93 ms).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import coco_config, fast, voc_config
from excel_tpu.engine import train as train_mod
from excel_tpu.engine.train import (TrainStepCache, compiled_train_step,
                                    init_train_state)
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.profiling import benchmark

BATCH = int(os.environ.get("BATCH", "32"))
DATASET = os.environ.get("DATASET", "voc")
ITERS = int(os.environ.get("ITERS", "8"))
WINDOWS = int(os.environ.get("WINDOWS", "3"))


def main():
    import dataclasses

    cfg = fast(coco_config() if DATASET == "coco" else voc_config())
    key = jax.random.PRNGKey(0)
    clip_params = cast_matmul_weights(init_clip_params(key, cfg.clip),
                                      jnp.bfloat16)
    params = init_excel_params(key, cfg, clip_params)
    state = init_train_state(params["head"], cfg.train)

    rng = np.random.default_rng(0)
    size = cfg.data.crop_size
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, size, size, 3)).astype(np.uint8))
    ncls = int(os.environ.get("NCLS", "5" if DATASET == "coco" else "3"))
    cls_np = np.zeros((BATCH, cfg.num_fg), np.float32)
    cls_np[:, :ncls] = 1.0
    cls_label = jnp.asarray(cls_np)
    n_bg = 23 if DATASET == "coco" else 25
    text_attr = jax.random.normal(key,
                                  (cfg.num_fg + n_bg, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)
    step_rng = jax.random.PRNGKey(1)

    cache = TrainStepCache(cfg)
    slots = int(os.environ["SLOTS"]) if "SLOTS" in os.environ \
        else cache.slots_for(cls_np)
    phase = (True, True)      # calibrated + seg_affinity (post-24k / bench)
    print(f"{DATASET}: batch {BATCH}, crop {size}, ncls {ncls}, "
          f"slots {slots}, par_iters {cfg.refine.par_iters}, phase {phase}")

    real_pseudo = train_mod.pseudo_labels
    real_aff_label = train_mod.affinity_label
    real_aff_loss = train_mod.aff_loss

    def compile_variant(name):
        """Fresh jit per variant; module globals patched only while this
        variant is the one being traced (each jit traces lazily on first
        call, so patches must persist until after warmup — handled by the
        patch dict below applied around benchmark())."""
        c = cfg
        if name == "par1":
            c = dataclasses.replace(
                cfg, refine=dataclasses.replace(cfg.refine, par_iters=1))
        calibrated = name != "uncal"
        return compiled_train_step(c, calibrated=calibrated,
                                   seg_affinity=True, donate=False,
                                   class_slots=slots)

    def patches_for(name):
        if name == "nopseudo":
            def stub_pseudo(lams, attn, par_imgs, cls, cfg_, crop_hw, caa,
                            seg_attn=None, class_slots=None):
                b = lams.shape[0]
                return jnp.zeros((b, *crop_hw), jnp.int32)
            return {"pseudo_labels": stub_pseudo}
        if name == "noaff":
            return {
                "affinity_label": lambda src, mask=None, ignore_index=255,
                downscale=16: jnp.zeros(
                    (src.shape[0],
                     (src.shape[1] // downscale) * (src.shape[2] // downscale),
                     (src.shape[1] // downscale) * (src.shape[2] // downscale)),
                    jnp.int32),
                "aff_loss": lambda pred, target: jnp.float32(0.0),
            }
        return {}

    variants = ["full", "par1", "nopseudo", "uncal", "noaff"]
    fns = {name: compile_variant(name) for name in variants}

    def run(name):
        pat = patches_for(name)
        for k, v in pat.items():
            setattr(train_mod, k, v)
        try:
            return benchmark(fns[name], state, clip_params, images,
                             cls_label, text_attr, step_rng,
                             iters=ITERS)["ms"]
        finally:
            setattr(train_mod, "pseudo_labels", real_pseudo)
            setattr(train_mod, "affinity_label", real_aff_label)
            setattr(train_mod, "aff_loss", real_aff_loss)

    times = {n: [] for n in variants}
    for _ in range(WINDOWS):                 # interleaved against chip noise
        for n in variants:
            times[n].append(run(n))
    med = {n: float(np.median(ts)) for n, ts in times.items()}
    it = cfg.refine.par_iters
    out = {
        "dataset": DATASET, "batch": BATCH, "ncls": ncls, "slots": slots,
        "iters": ITERS, "windows": WINDOWS,
        "full_ms": round(med["full"], 2),
        "img_per_s": round(BATCH / med["full"] * 1e3, 1),
        "par_diffusion_ms": round(
            (med["full"] - med["par1"]) * it / (it - 1), 2),
        "pseudo_pipeline_ms": round(med["full"] - med["nopseudo"], 2),
        "calibrated_second_pass_ms": round(med["full"] - med["uncal"], 2),
        "aff_label_loss_ms": round(med["full"] - med["noaff"], 2),
        "raw_ms": {n: round(v, 2) for n, v in med.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
