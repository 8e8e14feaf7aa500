"""LAM pseudo-label evaluation (reference tools/infer_lam.py).

    # training-free (no checkpoint)
    python -m excel_tpu.cli.infer_lam --dataset voc --data-root /data/VOC2012 \
        --clip-params assets/clip_vit_b16.npz --training-free

    # trained (flip-fused LVC-calibrated LAMs)
    python -m excel_tpu.cli.infer_lam ... --head work_dirs/run/head_30000.npz
"""
from __future__ import annotations

import argparse

import jax

from ..engine.evaluate import run_lam_eval
from ..engine.checkpoint import load_head_npz
from ..models.excel import init_excel_params
from ..text.class_names import class_list
from ..utils import format_metrics_table, setup_logger
from .common import (add_common_args, add_eval_gate_args,
                     check_expected_miou, eval_dataset, resolve)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--training-free", action="store_true")
    ap.add_argument("--head", default=None, help="trained head .npz")
    ap.add_argument("--split", default=None)
    ap.add_argument("--save-cam", action="store_true",
                    help="dump jet CAM overlays (max over classes) to "
                         "work_dir/cams/ (tools/infer_lam.py:97-111)")
    ap.add_argument("--save-cls-cam", action="store_true",
                    help="per-class CAM overlays instead of the max")
    ap.add_argument("--crf", action="store_true",
                    help="the reference's crf_post protocol "
                         "(tools/infer_lam.py:116-120,179-237): spill each "
                         "image's {bg + present-class normed cams, keys} to "
                         "work_dir/lam_logits/, run the host DenseCRF over "
                         "them, map the argmax back through keys, report "
                         "crf_seg_score")
    ap.add_argument("--crf-workers", type=int, default=None,
                    help="CRF thread-pool width (default 0.6 x cpu_count, "
                         "the reference's joblib sizing)")
    ap.add_argument("--crf-stream", action="store_true",
                    help="overlap the host CRF with the device sweep "
                         "(submit each image as its cams spill); identical "
                         "scores. Wins only on multi-core hosts — on a "
                         "1-core host the pool contends with sweep "
                         "dispatch (measured 13%% slower)")
    ap.add_argument("--crf-tpu", action="store_true",
                    help="on-device conv mean-field CRF branch fused into "
                         "the sweep (engine/evaluate.lam_crf_refine): no "
                         "spill, no host lattice — approximate vs --crf "
                         "(PARITY.md 'lam' bounds); reports "
                         "crf_tpu_seg_score")
    ap.add_argument("--crf-tpu-long-range", dest="crf_tpu_lr",
                    action=argparse.BooleanOptionalAction, default=None,
                    help="override CrfConfig.long_range for --crf-tpu "
                         "(default ON: moment-matched coarse level, "
                         "lam-family disagreement vs the lattice "
                         "10.96→4.02%%)")
    ap.add_argument("--save-preds", action="store_true",
                    help="with --crf: export the CRF-refined label maps as "
                         "palette PNGs (tools/infer_lam.py:223)")
    add_eval_gate_args(ap)
    args = ap.parse_args(argv)
    if ((args.crf_stream or args.crf_workers is not None
         or args.save_preds) and not args.crf):
        ap.error("--crf-stream/--crf-workers/--save-preds require --crf "
                 "(the host lattice pass)")

    logger = setup_logger()
    from ..parallel import initialize, make_mesh_for_batch, replicate
    from ..parallel.distributed import shard_dataset
    # no-op unless a multi-host env is present; MUST run before resolve()
    # (jax.distributed.initialize rejects processes that already touched
    # the XLA backend, and resolve() runs jax computations)
    initialize()
    cfg, clip_params, text_attr = resolve(args)
    if args.crf_tpu_lr is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, crf=dataclasses.replace(cfg.crf, long_range=args.crf_tpu_lr))
    dataset = eval_dataset(cfg, split=args.split)
    # multi-host: round-robin dataset shard per process (reference
    # tools/infer_lam.py:166-167), local-device DP inside each process,
    # exact global hist via the sweep's cross-process reduction
    dataset = shard_dataset(dataset)
    batch = args.batch_size or 4

    if args.training_free:
        params, mode = {"clip": clip_params}, "training_free"
    else:
        params = init_excel_params(jax.random.PRNGKey(0), cfg, clip_params)
        if args.head:
            params["head"] = load_head_npz(args.head, params["head"])
        elif not args.random_init:
            raise SystemExit("trained mode needs --head (or --training-free)")
        mode = "trained"

    mesh = make_mesh_for_batch(batch, devices=jax.local_devices())
    if mesh.size > 1:
        params = replicate(params, mesh)
        text_attr = replicate(text_attr, mesh)
    logger.info("LAM eval: mode=%s, %d images, data-parallel x%d", mode,
                len(dataset), mesh.size)
    done = [0]

    def progress(n):
        done[0] += n
        if done[0] % (50 * batch) < batch:
            logger.info("  %d / %d", done[0], len(dataset))

    save_cam = None
    if args.save_cam or args.save_cls_cam:
        import os

        from PIL import Image

        from ..text.class_names import class_list as _cl
        from ..utils import cam_overlay
        cam_dir = os.path.join(args.work_dir, "cams")
        os.makedirs(cam_dir, exist_ok=True)
        cls_names = (_cl(cfg.data.dataset)
                     if "synthetic" not in cfg.data.dataset
                     else [f"c{i}" for i in range(cfg.num_classes)])

        def save_cam(name, image, cams):
            fg = cams[1:]
            if args.save_cls_cam:
                for ci, cam in enumerate(fg):
                    if cam.max() <= 0:
                        continue
                    out = cam_overlay(image, cam)
                    Image.fromarray(out).save(os.path.join(
                        cam_dir, f"{name}_{cls_names[ci + 1]}.jpg"))
            else:
                out = cam_overlay(image, fg.max(axis=0))
                Image.fromarray(out).save(
                    os.path.join(cam_dir, name + ".jpg"))

    import os as _os

    from ..utils import save_palette_png, scores_from_hist

    save_lam_crf = None
    streaming_post = None
    crf_save_pred = None
    if args.crf:
        from ..engine.crf_post import crf_from_cfg, lam_spiller
        lam_logits_dir = _os.path.join(args.work_dir, "lam_logits")
        spill = lam_spiller(lam_logits_dir)
        save_lam_crf = spill
        if args.save_preds:
            pred_dir = _os.path.join(args.work_dir, "crf_preds")
            _os.makedirs(pred_dir, exist_ok=True)

            def crf_save_pred(name, pred):
                save_palette_png(pred, _os.path.join(pred_dir, name + ".png"),
                                 num_classes=cfg.num_classes)

        if args.crf_stream:
            from ..engine.crf_post import StreamingCrfPost
            streaming_post = StreamingCrfPost(
                dataset, lam_logits_dir, crf_from_cfg(cfg.crf),
                cfg.num_classes, kind="lam", num_workers=args.crf_workers,
                save_pred=crf_save_pred)

            def save_lam_crf(name, valid_lam, keys):
                spill(name, valid_lam, keys)
                streaming_post.submit(name)

    import time as _time
    from ..utils.logutils import log_sweep_rate
    t0 = _time.perf_counter()
    scores = run_lam_eval(params, dataset, text_attr, cfg, mode=mode,
                          batch_size=batch, progress=progress,
                          save_cam=save_cam, save_lam_crf=save_lam_crf,
                          mesh=mesh if mesh.size > 1 else None,
                          crf_tpu=args.crf_tpu,
                          checkpoint_path=args.hist_ckpt)
    crf_tpu_scores = None
    if args.crf_tpu:
        scores, crf_tpu_scores = scores
    log_sweep_rate(logger, len(dataset), t0)
    names = (class_list(cfg.data.dataset)
             if "synthetic" not in cfg.data.dataset
             else [f"c{i}" for i in range(cfg.num_classes)])
    from ..parallel.distributed import global_sum_host, is_primary
    if is_primary():
        logger.info("Training_free:%s, LAM_score:\n%s", args.training_free,
                    format_metrics_table(scores, names,
                                         metrics=("confusion", "precision",
                                                  "recall", "iou")))
    if crf_tpu_scores is not None and is_primary():
        logger.info("crf_tpu_seg_score (on-device approx; --crf is the "
                    "exact-form pass):\n%s",
                    format_metrics_table(crf_tpu_scores, names))

    if args.crf:
        from ..engine.crf_post import (crf_from_cfg, default_workers,
                                       run_crf_post)
        workers = args.crf_workers or default_workers()
        t0 = _time.perf_counter()
        if streaming_post is not None:
            logger.info("crf post-processing (streamed, draining)...")
            hist = streaming_post.finish()
        else:
            logger.info("crf post-processing (%d images, %d threads)...",
                        len(dataset), workers)
            # same parameter set as the seg pass (tools/infer_lam.py:189-196
            # == tools/infer_seg_voc.py:113-120); local shard -> global
            # reduction
            hist = run_crf_post(dataset, lam_logits_dir,
                                crf_from_cfg(cfg.crf), cfg.num_classes,
                                kind="lam", num_workers=workers,
                                save_pred=crf_save_pred)
        log_sweep_rate(logger, len(dataset), t0)
        crf_scores = scores_from_hist(global_sum_host(hist))
        if is_primary():
            logger.info("crf_seg_score:\n%s",
                        format_metrics_table(crf_scores, names))
        check_expected_miou(args, crf_scores, logger)
        return scores, crf_scores
    if crf_tpu_scores is not None:
        check_expected_miou(args, crf_tpu_scores, logger)
        return scores, crf_tpu_scores
    check_expected_miou(args, scores, logger)
    return scores


if __name__ == "__main__":
    main()
