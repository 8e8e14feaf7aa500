"""Shared CLI plumbing: config resolution, asset loading, dataset building.

One typed config tree + a handful of flags replaces the reference's ~45
argparse flags duplicated per entry point (SURVEY.md §5.6).
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (ExcelConfig, asset_path, coco_config, tiny_config,
                      voc_config)
from ..data import ClsCropDataset, EvalDataset, make_dataset
from ..models.excel import build_text_bank, init_excel_params
from ..models.params import init_clip_params, load_params_npz


def add_common_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--dataset", default="voc", choices=["voc", "coco"])
    ap.add_argument("--data-root", default=None,
                    help="dataset root (VOC2012 / coco2014 layout)")
    ap.add_argument("--split-dir", default=None,
                    help="split-list dir (default: bundled assets)")
    ap.add_argument("--clip-params", default=None,
                    help="converted CLIP weights .npz "
                         "(see excel_tpu.cli.convert_clip)")
    ap.add_argument("--random-init", action="store_true",
                    help="random weights + random text bank (smoke runs)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model config (CI / smoke)")
    ap.add_argument("--fast", action="store_true",
                    help="bf16 production fast path (fused kernels; fp32 "
                         "default matches the reference bit-for-bit)")
    ap.add_argument("--synthetic", default=None, metavar="N",
                    help="generate an N-image synthetic dataset instead of "
                         "reading --data-root")
    ap.add_argument("--work-dir", default="work_dirs/run")
    ap.add_argument("--batch-size", type=int, default=None)


def add_eval_gate_args(ap: argparse.ArgumentParser) -> None:
    """Flags shared by the eval CLIs: the real-assets mIoU gate
    (RUNBOOK.md) and resumable-sweep hist checkpointing."""
    ap.add_argument("--expect-miou", type=float, default=None,
                    help="real-assets validation gate: exit nonzero unless "
                         "the final mIoU (%%) is within --miou-tol of this "
                         "(RUNBOOK.md expected numbers per protocol)")
    ap.add_argument("--miou-tol", type=float, default=0.3)
    ap.add_argument("--hist-ckpt", default=None,
                    help="periodic hist checkpoint file; rerunning with the "
                         "same protocol resumes a killed sweep "
                         "(tools/test_msc_flip_voc.py:57-131 idiom)")


def check_expected_miou(args, scores, logger) -> None:
    """--expect-miou gate shared by the eval CLIs: turns 'point me at real
    assets and tell me if I match' into a pass/fail exit code."""
    if getattr(args, "expect_miou", None) is None:
        return
    got = 100.0 * scores["miou"]
    delta = abs(got - args.expect_miou)
    if delta > args.miou_tol:
        logger.error("mIoU %.2f misses expectation %.2f by %.2f (tol %.2f)",
                     got, args.expect_miou, delta, args.miou_tol)
        raise SystemExit(3)
    logger.info("mIoU %.2f within %.2f of expected %.2f — PASS", got,
                args.miou_tol, args.expect_miou)


def build_config(args) -> ExcelConfig:
    if args.tiny:
        cfg = tiny_config()
    elif args.dataset == "coco":
        cfg = coco_config()
    else:
        cfg = voc_config()
    data = cfg.data
    if args.data_root:
        data = dataclasses.replace(data, root_dir=args.data_root)
    if args.split_dir:
        data = dataclasses.replace(data, split_dir=args.split_dir)
    return dataclasses.replace(cfg, data=data)


def load_clip(args, cfg: ExcelConfig):
    if args.clip_params:
        return load_params_npz(args.clip_params, cfg.clip)
    if not args.random_init:
        default = asset_path("clip_vit_b16.npz")
        if os.path.exists(default):
            return load_params_npz(default, cfg.clip)
        raise SystemExit(
            "no CLIP weights: pass --clip-params (convert with "
            "python -m excel_tpu.cli.convert_clip) or --random-init")
    return init_clip_params(jax.random.PRNGKey(cfg.train.seed), cfg.clip)


def load_text_bank(args, cfg: ExcelConfig, clip_params) -> jax.Array:
    """Enriched text embeddings: prompt ensemble + TSE over the bundled
    cluster bank (model/model_excel.py:33-35)."""
    from ..text.class_names import prompt_vocabulary

    if args.random_init:
        rng = np.random.default_rng(cfg.train.seed)
        n_bg = 3 if args.tiny else (25 if args.dataset == "voc" else 23)
        bank = rng.normal(size=(cfg.num_fg + n_bg,
                                cfg.clip.embed_dim)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
        return jnp.asarray(bank)
    ds_name = "pascal_voc" if args.dataset == "voc" else "ms_coco"
    bank_file = asset_path(
        "attributes", f"{ds_name}_bank_{cfg.num_attr_clusters}.npz")
    z = np.load(bank_file)
    cluster_bank = jnp.asarray(z["cluster_bank"])
    vocab = prompt_vocabulary(ds_name)
    return build_text_bank(clip_params, cfg, vocab, cluster_bank)


def build_synthetic(args, cfg: ExcelConfig) -> ExcelConfig:
    """Generate a synthetic tree under work_dir and point cfg.data at it.

    Multi-host safe on a shared work_dir: only the primary generates; other
    processes wait for the completion marker (generation is seed-
    deterministic, so every process sees identical data either way)."""
    import time

    import jax

    from ..data.synthetic import make_voc_tree
    from ..parallel.distributed import is_primary

    root = os.path.join(args.work_dir, "synthetic_data")
    size_range = ((48, 96) if args.tiny else (200, 400))
    marker = os.path.join(root, ".complete")
    # marker carries the generation parameters: a rerun with a different
    # size/seed/class-count must regenerate, not silently reuse stale data
    spec = (f"{int(args.synthetic)}:{cfg.train.seed}:{cfg.num_fg}:"
            f"{size_range}")

    def marker_matches():
        try:
            with open(marker) as f:
                return f.read() == spec
        except OSError:
            return False

    if marker_matches() or (jax.process_count() > 1 and not is_primary()):
        deadline = time.time() + 120
        while not marker_matches():
            if time.time() > deadline:
                raise TimeoutError(f"waiting for synthetic tree at {root}")
            time.sleep(0.5)
        split_dir = os.path.join(root, "splits")
    else:
        split_dir = make_voc_tree(root, num_images=int(args.synthetic),
                                  seed=cfg.train.seed, num_fg=cfg.num_fg,
                                  size_range=size_range)
        with open(marker, "w") as f:
            f.write(spec)
    data = dataclasses.replace(cfg.data, root_dir=root, split_dir=split_dir,
                               # synthetic trees always use the VOC layout
                               dataset="synthetic_voc", train_split="train_aug",
                               eval_pad=(96 if args.tiny else cfg.data.eval_pad))
    return dataclasses.replace(cfg, data=data)


def resolve(args):
    """(cfg, clip_params, text_attr) after applying synthetic/random flags."""
    cfg = build_config(args)
    if getattr(args, "fast", False):
        from ..config import fast as _fast
        cfg = _fast(cfg)
    if args.synthetic:
        cfg = build_synthetic(args, cfg)
    clip_params = load_clip(args, cfg)
    text_attr = load_text_bank(args, cfg, clip_params)
    if cfg.clip.compute_dtype == jnp.bfloat16:
        from ..models.params import cast_matmul_weights
        clip_params = cast_matmul_weights(clip_params, jnp.bfloat16)
    return cfg, clip_params, text_attr


def train_dataset(cfg: ExcelConfig):
    base = make_dataset(cfg.data, cfg.data.train_split, "train")
    base.num_fg = cfg.num_fg
    return ClsCropDataset(base, crop_size=cfg.data.crop_size,
                          rescale_range=tuple(cfg.data.rescale_range),
                          ignore_index=cfg.data.ignore_index)


def eval_dataset(cfg: ExcelConfig, split: str | None = None,
                 stage: str = "val"):
    base = make_dataset(cfg.data, split or cfg.data.val_split, stage)
    base.num_fg = cfg.num_fg
    return EvalDataset(base)
