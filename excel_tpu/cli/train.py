"""Training driver (reference scripts/train_voc.py / train_coco.py).

    python -m excel_tpu.cli.train --dataset voc --data-root /data/VOC2012 \
        --clip-params assets/clip_vit_b16.npz

One driver covers both datasets (presets in excel_tpu.config); the
reference's 14k/24k/30k schedule thresholds select between three compiled
specializations of the same jitted train step. Data parallelism: the batch
is sharded over every visible device; params are replicated; XLA reduces
the gradients over ICI.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.checkpoint import (latest_checkpoint, restore_checkpoint,
                                 save_checkpoint, save_head_npz)
from ..engine.evaluate import run_validation
from ..engine.train import TrainStepCache, _phase, init_train_state
from ..models.excel import init_excel_params
from ..parallel import make_mesh_for_batch, replicate, shard_batch
from ..data import train_batches
from ..text.class_names import class_list
from ..utils import AverageMeter, Eta, format_metrics_table, setup_logger
from .common import (add_common_args, eval_dataset, resolve, train_dataset)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--eval-iters", type=int, default=None)
    ap.add_argument("--log-iters", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-eval", action="store_true")
    ap.add_argument("--viz", action="store_true",
                    help="dump image/pseudo/seg colormap panels at each eval "
                         "(the reference's TensorBoard grids, utils/tbutils)")
    ap.add_argument("--tensorboard", action="store_true",
                    help="write TensorBoard scalars (lr/losses/val mIoU) and "
                         "image grids under work_dir/tb (reference "
                         "scripts/train_voc.py:99-102,233-246)")
    ap.add_argument("--num-workers", type=int, default=None,
                    help="decode/augment worker threads (default: "
                         "min(10, cpu_count), the reference's 10 workers "
                         "per rank, scripts/train_voc.py:148-165)")
    args = ap.parse_args(argv)

    from ..parallel import initialize
    initialize()                      # no-op unless multi-host env present
    os.makedirs(args.work_dir, exist_ok=True)
    logger = setup_logger(os.path.join(args.work_dir, "train.log"))

    cfg, clip_params, text_attr = resolve(args)
    import dataclasses
    tr = cfg.train
    overrides = {k: getattr(args, a) for k, a in
                 [("max_iters", "max_iters"), ("eval_iters", "eval_iters"),
                  ("log_iters", "log_iters")] if getattr(args, a)}
    if overrides:
        tr = dataclasses.replace(tr, **overrides)
        cfg = dataclasses.replace(cfg, train=tr)
    batch_size = args.batch_size or cfg.train.batch_size

    if jax.process_count() > 1:
        # multi-host: one mesh over every host's chips; the global batch is
        # batch_size (per process) x process_count and each process feeds
        # its own loader shard (parallel.shard_local_batch). The per-host
        # device count is trimmed symmetrically to divide the per-process
        # batch (the multi-host analogue of make_mesh_for_batch).
        from ..parallel.mesh import make_mesh_for_batch_multihost
        mesh = make_mesh_for_batch_multihost(batch_size)
    else:
        mesh = make_mesh_for_batch(batch_size)
    logger.info("devices: %s  (data-parallel x%d)", jax.devices(), mesh.size)
    logger.info("config: %s", cfg)

    key = jax.random.PRNGKey(cfg.train.seed)
    params = init_excel_params(key, cfg, clip_params)
    state = init_train_state(params["head"], cfg.train)

    ckpt_dir = os.path.join(args.work_dir, "checkpoints")
    if args.resume:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            state = restore_checkpoint(latest, state)
            logger.info("resumed from %s (step %d)", latest, int(state.step))

    state = replicate(state, mesh)
    clip_r = replicate(clip_params, mesh)
    text_r = replicate(jnp.asarray(text_attr), mesh)

    steps = TrainStepCache(cfg)
    dataset = train_dataset(cfg)
    val_ds = None if args.no_eval else eval_dataset(cfg)
    if val_ds is not None and jax.process_count() > 1:
        # every process validates its round-robin shard; the sweep's
        # cross-process hist reduction makes the scores global. (Validation
        # must run on ALL processes — its final reduction is a collective.)
        from ..parallel.distributed import shard_dataset
        val_ds = shard_dataset(val_ds)
    logger.info("train samples: %d", len(dataset))

    meter = AverageMeter()
    eta = Eta(cfg.train.max_iters)
    workers = args.num_workers
    if workers is None:
        workers = min(10, os.cpu_count() or 1)
    batches = train_batches(dataset, batch_size, seed=cfg.train.seed,
                            num_workers=workers,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    start = int(np.asarray(jax.device_get(state.step)))

    names = (class_list(cfg.data.dataset)
             if "synthetic" not in cfg.data.dataset
             else [f"c{i}" for i in range(cfg.num_classes)])

    tb = None
    from ..parallel import is_primary
    if getattr(args, "tensorboard", False) and is_primary():
        # reference C30: opt-in TensorBoard scalars + image grids
        # (utils/tbutils.py, wired at scripts/train_voc.py:99-102,233-246).
        # Pure-Python event writer — no torch in the production driver.
        # Primary-only, like the reference's rank-0 writer gating.
        from ..utils.tb import SummaryWriter
        tb = SummaryWriter(os.path.join(args.work_dir, "tb"))

    try:
        _train_loop(args, cfg, steps, batches, start, state, clip_r, text_r,
                    mesh, meter, eta, logger, ckpt_dir, clip_params,
                    text_attr, val_ds, names, tb, batch_size)
    finally:
        if tb is not None:
            tb.close()
    logger.info("done: %d iters", cfg.train.max_iters)


def _train_loop(args, cfg, steps, batches, start, state, clip_r, text_r,
                mesh, meter, eta, logger, ckpt_dir, clip_params, text_attr,
                val_ds, names, tb, batch_size):
    from ..parallel import is_primary, shard_local_batch
    multi = jax.process_count() > 1
    shard = shard_local_batch if multi else shard_batch
    for n_iter in range(start, cfg.train.max_iters):
        batch = next(batches)
        if multi:
            # the slot bucket must be identical on every process (it picks
            # the compiled program, hence the collective set); local batches
            # differ, so multi-host always runs the full class stack
            step_fn = steps.full(_phase(cfg, n_iter))
        else:
            step_fn = steps(_phase(cfg, n_iter), batch["cls_label"])
        images, cls = shard((batch["image"], batch["cls_label"]), mesh)
        state, metrics = step_fn(state, clip_r, images, cls, text_r,
                                 jax.random.PRNGKey(n_iter))
        meter.add({k: float(v) for k, v in jax.device_get(metrics).items()})

        it = n_iter + 1
        if it % cfg.train.log_iters == 0:
            elapsed, remaining = eta(it - start)
            lr, segl, divl = (meter.pop("lr"), meter.pop("seg_loss"),
                              meter.pop("diver_loss"))
            logger.info(
                "Iter: %d; Elapsed: %s; ETA: %s; LR: %.3e; "
                "seg_loss: %.4f, diver_loss: %.4f", it, elapsed, remaining,
                lr, segl, divl)
            if tb is not None:
                tb.add_scalar("train/lr", lr, it)
                tb.add_scalar("train/seg_loss", segl, it)
                tb.add_scalar("train/diver_loss", divl, it)
        if it % cfg.train.eval_iters == 0 or it == cfg.train.max_iters:
            host_state = jax.device_get(state)
            # orbax saves are COLLECTIVE in multi-host (every process must
            # call save on the same shared work_dir; orbax barriers and
            # writes once) — do NOT primary-gate this line
            path = save_checkpoint(ckpt_dir, host_state)
            if is_primary():
                # rank-0 gating for plain-file writes + logs (reference
                # scripts/train_voc.py:231,251)
                save_head_npz(os.path.join(args.work_dir, f"head_{it}.npz"),
                              host_state.head)
                logger.info("checkpoint: %s", path)
            if val_ds is not None:
                # validation runs on EVERY process (each sweeps its dataset
                # shard; the final hist reduction is a collective) — only
                # the reporting is primary-gated
                eval_params = {"clip": clip_params, "head": host_state.head}
                pseudo, seg = run_validation(eval_params, val_ds, text_attr,
                                             cfg, batch_size=batch_size)
                if not is_primary():
                    continue
                logger.info("val @%d:\n[pseudo]\n%s\n[seg]\n%s", it,
                            format_metrics_table(pseudo, names),
                            format_metrics_table(seg, names))
                if tb is not None:
                    tb.add_scalar("val/pseudo_miou", pseudo["miou"], it)
                    tb.add_scalar("val/seg_miou", seg["miou"], it)
                if args.viz or tb is not None:
                    _dump_viz(args.work_dir, it, eval_params, val_ds,
                              text_attr, cfg, batch_size, tb=tb,
                              save_jpg=args.viz)


def _dump_viz(work_dir, it, params, val_ds, text_attr, cfg, batch_size,
              tb=None, save_jpg=True):
    """Side-by-side image / pseudo-label / seg panels for the first val
    batch, as JPGs and/or TensorBoard image grids (reference C30)."""
    from PIL import Image

    from ..engine.evaluate import _batched, _prep_batch, val_step
    from ..utils import encode_cmap

    viz_dir = os.path.join(work_dir, "viz")
    os.makedirs(viz_dir, exist_ok=True)
    canvas = (cfg.data.eval_pad, cfg.data.eval_pad)
    samples = next(iter(_batched(val_ds, min(batch_size, 4))))
    images, cls, _, valid = _prep_batch(samples, cfg.clip.image_size, canvas)
    pseudos, segs = val_step(params, images, cls, valid, text_attr, cfg,
                             canvas)
    pseudos, segs = np.asarray(pseudos), np.asarray(segs)
    for i, s in enumerate(samples):
        h, w = s["label"].shape
        panel = np.concatenate([
            s["image"][:h, :w],
            encode_cmap(pseudos[i, :h, :w]),
            encode_cmap(segs[i, :h, :w]),
        ], axis=1)
        if save_jpg:
            Image.fromarray(panel).save(
                os.path.join(viz_dir, f"iter{it}_{s['name']}.jpg"))
        if tb is not None:
            tb.add_image(f"val/{s['name']}", panel, it, dataformats="HWC")


if __name__ == "__main__":
    main()
