"""Shared deterministic workload for the multi-host proof test.

Run by BOTH the 2-process gloo workers (tests/mh_worker.py) and the
single-process comparison inside tests/test_multihost.py — the same code
path builds the same jit graphs, so results must agree across process
topologies. Covers: replicated params, `shard_local_batch` feeding (the
DistributedSampler analogue), one data-parallel train step (gradient psum
over all devices), and a sharded confusion-hist update (globally reduced —
fixing the reference's never-reduced per-rank metrics,
tools/infer_lam.py:166-167).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def run_workload() -> dict:
    from excel_tpu.config import tiny_config
    from excel_tpu.engine.train import compiled_train_step, init_train_state
    from excel_tpu.models.excel import init_excel_params
    from excel_tpu.models.params import init_clip_params
    from excel_tpu.parallel import make_mesh, replicate, shard_local_batch
    from excel_tpu.utils.metrics import init_hist, update_hist

    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    params = init_excel_params(key, cfg, clip_params)
    state = init_train_state(params["head"], cfg.train)
    mesh = make_mesh()

    rng = np.random.default_rng(0)
    B = 8
    images = rng.integers(0, 256, (B, 64, 64, 3), dtype=np.uint8)
    cls = (rng.random((B, cfg.num_fg)) < 0.4).astype(np.float32)
    cls[:, 0] = 1.0
    ta = rng.standard_normal((cfg.num_fg + 3, cfg.clip.embed_dim))
    ta = (ta / np.linalg.norm(ta, axis=-1, keepdims=True)).astype(np.float32)
    gts = rng.integers(0, cfg.num_classes, (B, 16, 16)).astype(np.int32)
    preds = rng.integers(0, cfg.num_classes, (B, 16, 16)).astype(np.int32)

    # this process's loader shard: contiguous rows in process order
    pc, pi = jax.process_count(), jax.process_index()
    local = slice(pi * B // pc, (pi + 1) * B // pc)

    state_r = replicate(state, mesh)
    clip_r = replicate(clip_params, mesh)
    ta_r = replicate(jnp.asarray(ta), mesh)
    rng_r = replicate(jax.random.PRNGKey(1), mesh)
    im_g, cls_g = shard_local_batch((images[local], cls[local]), mesh)

    step = compiled_train_step(cfg, calibrated=False, seg_affinity=False,
                               donate=False)
    new_state, metrics = step(state_r, clip_r, im_g, cls_g, ta_r, rng_r)

    gts_g, preds_g = shard_local_batch((gts[local], preds[local]), mesh)
    hist = update_hist(replicate(init_hist(cfg.num_classes), mesh),
                       gts_g, preds_g, cfg.num_classes)

    head_flat = np.concatenate([
        np.asarray(jax.device_get(leaf), np.float32).ravel()
        for leaf in jax.tree_util.tree_leaves(new_state.head)])
    return {
        "loss": np.float32(jax.device_get(metrics["loss"])),
        "seg_loss": np.float32(jax.device_get(metrics["seg_loss"])),
        "diver_loss": np.float32(jax.device_get(metrics["diver_loss"])),
        "hist": np.asarray(jax.device_get(hist)),
        "head": head_flat,
        "step": np.int32(jax.device_get(new_state.step)),
    }


def run_eval_workload(root: str, split_dir: str) -> dict:
    """Sharded training-free LAM sweep over a synthetic mini-VOC tree:
    each process evaluates its round-robin dataset shard on its LOCAL
    devices and the sweep's cross-process hist reduction makes the scores
    global — the multi-host inference protocol of cli/infer_lam."""
    import dataclasses

    import jax.numpy as jnp

    from excel_tpu.config import tiny_config
    from excel_tpu.data import EvalDataset, VocDataset
    from excel_tpu.engine.evaluate import run_lam_eval
    from excel_tpu.models.params import init_clip_params
    from excel_tpu.parallel.distributed import shard_dataset

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, eval_pad=96))
    base = VocDataset(root, split_dir, "val", "val")
    base.num_fg = cfg.num_fg
    dataset = shard_dataset(EvalDataset(base))

    clip = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    ta = np.random.default_rng(0).normal(
        size=(cfg.num_fg + 3, cfg.clip.embed_dim)).astype(np.float32)
    scores = run_lam_eval({"clip": clip}, dataset, jnp.asarray(ta), cfg,
                          mode="training_free", batch_size=1)
    return {"eval_iou": np.asarray(
        [scores["iou"][k] for k in range(cfg.num_classes)], np.float64)}
