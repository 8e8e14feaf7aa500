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

from ..engine.checkpoint import load_head_npz
from ..engine.crf_post import crf_from_cfg, run_crf_post, seg_logit_spiller
from ..engine.evaluate import run_msc_seg_eval
from ..models.excel import init_excel_params
from ..text.class_names import class_list
from ..utils import (format_metrics_table, save_palette_png,
                     scores_from_hist, setup_logger)
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
                         "tools/infer_seg_voc.py:90-91,103-174): the sweep "
                         "spills one npy per image to work_dir/logits/, "
                         "then a bounded-memory thread pool streams them "
                         "through the lattice")
    ap.add_argument("--crf-scale", type=float, default=None,
                    help="spill logits at this fraction of label "
                         "resolution (disk bound; the CRF pass upsamples "
                         "before the softmax). Default 1.0, except 0.2 for "
                         "COCO — the reference's hard-coded disk bound "
                         "(tools/infer_seg_coco.py:62-64)")
    ap.add_argument("--crf-workers", type=int, default=None,
                    help="CRF thread-pool width (default 0.6 x cpu_count, "
                         "the reference's joblib sizing)")
    ap.add_argument("--crf-stream", action="store_true",
                    help="overlap the host CRF with the device sweep "
                         "(submit each image as its logits spill) — "
                         "wall-clock ~ max(sweep, crf) instead of their "
                         "sum on multi-core hosts; identical scores. On a "
                         "1-core host it measured 13%% SLOWER (the pool "
                         "contends with sweep dispatch) — don't use there")
    ap.add_argument("--crf-tpu", action="store_true",
                    help="on-device convolutional mean-field CRF (runs "
                         "inside the sweep, no host round-trip); affects "
                         "raw_seg_score and --save-preds only — combined "
                         "with --crf, the host pass still consumes pre-CRF "
                         "logits (never double-CRF)")
    ap.add_argument("--crf-tpu-long-range", dest="crf_tpu_lr",
                    action=argparse.BooleanOptionalAction, default=None,
                    help="override CrfConfig.long_range for --crf-tpu "
                         "(default ON: moment-matched coarse level, 4-10x "
                         "closer lattice agreement for ~9 ms/batch; "
                         "--no-crf-tpu-long-range trades it back)")
    ap.add_argument("--save-preds", action="store_true",
                    help="export palette PNGs (VOC server format)")
    add_eval_gate_args(ap)
    args = ap.parse_args(argv)
    if (args.crf_stream or args.crf_workers is not None) and not args.crf:
        ap.error("--crf-stream/--crf-workers require --crf (the host "
                 "lattice pass); --crf-tpu runs inside the sweep instead")

    logger = setup_logger()
    from ..parallel import initialize, make_mesh_for_batch, replicate
    # no-op unless a multi-host env is present; MUST run before resolve()
    # (jax.distributed.initialize rejects processes that already touched
    # the XLA backend, and resolve() runs jax computations)
    initialize()
    cfg, clip_params, text_attr = resolve(args)
    if args.crf_tpu_lr is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, crf=dataclasses.replace(cfg.crf, long_range=args.crf_tpu_lr))
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

    def save_pred(name, label):
        os.makedirs(pred_dir, exist_ok=True)
        save_palette_png(label, os.path.join(pred_dir, name + ".png"),
                         num_classes=cfg.num_classes)

    save_logits = None
    streaming_post = None
    if args.crf:
        crf_scale = args.crf_scale
        if crf_scale is None:
            # reference disk bound: COCO logits spill at 0.2x label res
            # (tools/infer_seg_coco.py:62-64); VOC at full res (:90-91)
            crf_scale = 0.2 if args.dataset == "coco" else 1.0
        logits_dir = os.path.join(args.work_dir, "logits")
        spill = seg_logit_spiller(logits_dir, scale=crf_scale)
        save_logits = spill
        if args.crf_stream:
            from ..engine.crf_post import StreamingCrfPost
            streaming_post = StreamingCrfPost(
                dataset, logits_dir, crf_from_cfg(cfg.crf), cfg.num_classes,
                kind="seg", num_workers=args.crf_workers,
                save_pred=(lambda n, p: save_pred(n + "_crf", p))
                if args.save_preds else None)

            def save_logits(name, logits):
                spill(name, logits)
                streaming_post.submit(name)

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
        save_logits=save_logits,
        crf_tpu=args.crf_tpu, mesh=mesh if mesh.size > 1 else None,
        checkpoint_path=args.hist_ckpt)
    log_sweep_rate(logger, len(dataset), t0)
    from ..parallel.distributed import global_sum_host, is_primary
    if is_primary():
        logger.info("raw_seg_score:\n%s",
                    format_metrics_table(scores, names,
                                         metrics=("confusion", "precision",
                                                  "recall", "iou")))

    if args.crf:
        from ..engine.crf_post import default_workers
        workers = args.crf_workers or default_workers()
        t0 = _time.perf_counter()
        if streaming_post is not None:
            # already overlapped with the sweep; drain the remainder
            logger.info("crf post-processing (streamed, draining)...")
            hist = streaming_post.finish()
        else:
            logger.info("crf post-processing (%d images, %d threads)...",
                        len(dataset), workers)
            # param set of tools/infer_seg_voc.py:113-120; streaming pass
            # over this process's shard, then a cross-process hist reduction
            # (the reference prints per-rank tables unreduced,
            # infer_lam.py:166-167)
            hist = run_crf_post(
                dataset, os.path.join(args.work_dir, "logits"),
                crf_from_cfg(cfg.crf), cfg.num_classes, kind="seg",
                num_workers=workers,
                save_pred=(lambda n, p: save_pred(n + "_crf", p))
                if args.save_preds else None)
        log_sweep_rate(logger, len(dataset), t0)
        crf_scores = scores_from_hist(global_sum_host(hist))
        if is_primary():
            logger.info("crf_seg_score:\n%s",
                        format_metrics_table(crf_scores, names))
        check_expected_miou(args, crf_scores, logger)
        return scores, crf_scores
    check_expected_miou(args, scores, logger)
    return scores


if __name__ == "__main__":
    main()
