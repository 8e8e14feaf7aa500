"""MSC+flip segmentation evaluation with optional dense-CRF post-processing
(reference tools/infer_seg_voc.py / infer_seg_coco.py /
test_msc_flip_voc.py).

    python -m excel_tpu.cli.infer_seg --dataset voc --data-root /data/VOC2012 \
        --clip-params assets/clip_vit_b16.npz --head head_30000.npz --crf
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..crf import DenseCRF
from ..engine.checkpoint import load_head_npz
from ..engine.evaluate import run_msc_seg_eval
from ..models.excel import init_excel_params
from ..text.class_names import class_list
from ..utils import (format_metrics_table, init_hist, save_palette_png,
                     scores_from_hist, setup_logger, update_hist)
from .common import (add_common_args, add_eval_gate_args,
                     check_expected_miou, eval_dataset, resolve)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--head", default=None, help="trained head .npz")
    ap.add_argument("--split", default=None)
    ap.add_argument("--scales", default="1.0,0.7,1.2,1.5",
                    help="MSC scales (x crop size)")
    ap.add_argument("--crf", action="store_true",
                    help="host C++ dense-CRF post-processing pass over the "
                         "saved PRE-CRF fused logits (reference protocol, "
                         "tools/infer_seg_voc.py:90-91,103-174)")
    ap.add_argument("--crf-tpu", action="store_true",
                    help="on-device convolutional mean-field CRF (runs "
                         "inside the sweep, no host round-trip); affects "
                         "raw_seg_score and --save-preds only — combined "
                         "with --crf, the host pass still consumes pre-CRF "
                         "logits (never double-CRF)")
    ap.add_argument("--save-preds", action="store_true",
                    help="export palette PNGs (VOC server format)")
    add_eval_gate_args(ap)
    args = ap.parse_args(argv)

    logger = setup_logger()
    from ..parallel import initialize, make_mesh_for_batch, replicate
    # no-op unless a multi-host env is present; MUST run before resolve()
    # (jax.distributed.initialize rejects processes that already touched
    # the XLA backend, and resolve() runs jax computations)
    initialize()
    cfg, clip_params, text_attr = resolve(args)
    stage = "test" if args.split == "test" else "val"
    dataset = eval_dataset(cfg, split=args.split, stage=stage)
    from ..parallel.distributed import shard_dataset
    dataset = shard_dataset(dataset)   # multi-host round-robin (no-op else)
    batch = args.batch_size or 4
    scales = tuple(float(s) for s in args.scales.split(","))

    params = init_excel_params(jax.random.PRNGKey(0), cfg, clip_params)
    if args.head:
        params["head"] = load_head_npz(args.head, params["head"])
    elif not args.random_init:
        raise SystemExit("--head required (or --random-init for smoke)")

    names = (class_list(cfg.data.dataset)
             if "synthetic" not in cfg.data.dataset
             else [f"c{i}" for i in range(cfg.num_classes)])
    pred_dir = os.path.join(args.work_dir, "preds")
    crf_items = []

    def save_pred(name, label):
        os.makedirs(pred_dir, exist_ok=True)
        save_palette_png(label, os.path.join(pred_dir, name + ".png"),
                         num_classes=cfg.num_classes)

    def save_logits(name, logits):
        crf_items.append((name, logits))

    mesh = make_mesh_for_batch(batch, devices=jax.local_devices())
    if mesh.size > 1:
        params = replicate(params, mesh)
        text_attr = replicate(text_attr, mesh)
    logger.info("MSC+flip seg eval: scales=%s, %d images, data-parallel x%d",
                scales, len(dataset), mesh.size)
    import time as _time
    from ..utils.logutils import log_sweep_rate
    t0 = _time.perf_counter()
    scores = run_msc_seg_eval(
        params, dataset, text_attr, cfg, scales=scales, batch_size=batch,
        save_pred=save_pred if args.save_preds else None,
        save_logits=save_logits if args.crf else None,
        crf_tpu=args.crf_tpu, mesh=mesh if mesh.size > 1 else None,
        checkpoint_path=args.hist_ckpt)
    log_sweep_rate(logger, len(dataset), t0)
    logger.info("raw_seg_score:\n%s",
                format_metrics_table(scores, names,
                                     metrics=("confusion", "precision",
                                              "recall", "iou")))

    if args.crf:
        logger.info("crf post-processing (%d images)...", len(crf_items))
        # param set of tools/infer_seg_voc.py:113-120
        crf = DenseCRF(iter_max=cfg.crf.iters, pos_w=cfg.crf.pos_w,
                       pos_xy_std=cfg.crf.pos_xy_std, bi_w=cfg.crf.bi_w,
                       bi_xy_std=cfg.crf.bi_xy_std,
                       bi_rgb_std=cfg.crf.bi_rgb_std)
        by_name = {dataset[i]["name"]: i for i in range(len(dataset))}
        hist = init_hist(cfg.num_classes)
        for name, logits in crf_items:
            s = dataset[by_name[name]]
            probs = np.exp(logits - logits.max(0, keepdims=True))
            probs /= probs.sum(0, keepdims=True)
            q = crf(s["image"], probs.astype(np.float32))
            pred = q.argmax(0).astype(np.int32)
            hist = update_hist(hist, s["label"], pred, cfg.num_classes)
            if args.save_preds:
                save_pred(name + "_crf", pred)
        crf_scores = scores_from_hist(np.asarray(hist))
        logger.info("crf_seg_score:\n%s",
                    format_metrics_table(crf_scores, names))
        check_expected_miou(args, crf_scores, logger)
        return scores, crf_scores
    check_expected_miou(args, scores, logger)
    return scores


if __name__ == "__main__":
    main()
