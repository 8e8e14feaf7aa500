"""Training convergence integration test (SURVEY.md §4b): on a synthetic
mini-dataset the LVC head must learn to reproduce its pseudo-label targets
— seg loss drops substantially within a few dozen iterations."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import tiny_config
from excel_tpu.data import ClsCropDataset, VocDataset, train_batches
from excel_tpu.data.synthetic import make_voc_tree
from excel_tpu.engine.train import compiled_train_step, init_train_state
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import init_clip_params


@pytest.mark.slow
def test_seg_loss_converges(tmp_path):
    import dataclasses
    cfg = tiny_config()
    # tiny preset's max_iters=10 poly-decays the LR to zero immediately;
    # give the schedule room for a real convergence check
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, max_iters=400,
                                       warmup_iters=5, lr=5e-4))
    root = str(tmp_path)
    split_dir = make_voc_tree(root, num_images=4, seed=0, num_fg=cfg.num_fg,
                              size_range=(64, 96))
    base = VocDataset(root, split_dir, "train_aug", "train")
    base.num_fg = cfg.num_fg
    ds = ClsCropDataset(base, crop_size=cfg.data.crop_size)

    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    params = init_excel_params(key, cfg, clip_params)
    state = init_train_state(params["head"], cfg.train)
    step = compiled_train_step(cfg, calibrated=False, seg_affinity=False,
                               donate=False)

    losses = []
    batches = train_batches(ds, cfg.train.batch_size, seed=0)
    for i in range(40):
        b = next(batches)
        state, m = step(state, clip_params, jnp.asarray(b["image"]),
                        jnp.asarray(b["cls_label"].astype(np.float32)),
                        jnp.asarray(np.random.default_rng(0).normal(
                            size=(cfg.num_fg + 3, cfg.clip.embed_dim))
                            .astype(np.float32)),
                        jax.random.PRNGKey(i))
        losses.append(float(m["seg_loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    # random frozen features bound how well pseudo-labels can be fit; a
    # steady >20% drop demonstrates the optimizer/loss plumbing learns
    assert last < 0.8 * first, (first, last)
    # and the trend is genuinely downward, not noise
    corr = np.corrcoef(np.arange(len(losses)), losses)[0, 1]
    assert corr < -0.3, corr


@pytest.mark.slow
def test_trained_head_beats_random_init_miou(tmp_path):
    """Metric-level convergence (stronger than the loss-drop smoke): after
    ~60 head iterations on a synthetic tree, the FULL eval path
    (run_msc_seg_eval -> hist -> scores) must score materially above the
    random-init head on the same scenes. Still a plumbing proof — tiny
    random CLIP, synthetic data; published-mIoU parity needs the RUNBOOK
    real-assets run — but it closes train->eval end to end: the learned
    head's argmax segmentation, not just its loss, improves."""
    import dataclasses

    from excel_tpu.data import EvalDataset
    from excel_tpu.engine.evaluate import run_msc_seg_eval

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, eval_pad=160),
        train=dataclasses.replace(cfg.train, max_iters=200, warmup_iters=5,
                                  lr=5e-4))
    root = str(tmp_path)
    split_dir = make_voc_tree(root, num_images=4, seed=0, num_fg=cfg.num_fg,
                              size_range=(100, 150))
    tbase = VocDataset(root, split_dir, "train_aug", "train")
    tbase.num_fg = cfg.num_fg
    ds = ClsCropDataset(tbase, crop_size=cfg.data.crop_size)
    vbase = VocDataset(root, split_dir, "val", "val")
    vbase.num_fg = cfg.num_fg
    eval_ds = EvalDataset(vbase)

    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    params = init_excel_params(key, cfg, clip_params)
    text_attr = jnp.asarray(np.random.default_rng(0).normal(
        size=(cfg.num_fg + 3, cfg.clip.embed_dim)).astype(np.float32))

    def miou(head):
        return run_msc_seg_eval(dict(params, head=head), eval_ds, text_attr,
                                cfg, scales=(1.0,), batch_size=2)["miou"]

    base_miou = miou(params["head"])

    state = init_train_state(params["head"], cfg.train)
    step = compiled_train_step(cfg, calibrated=False, seg_affinity=False,
                               donate=False)
    batches = train_batches(ds, cfg.train.batch_size, seed=0)
    for i in range(60):
        b = next(batches)
        state, _ = step(state, clip_params, jnp.asarray(b["image"]),
                        jnp.asarray(b["cls_label"].astype(np.float32)),
                        text_attr, jax.random.PRNGKey(i))
    trained_miou = miou(state.head)
    # pipeline_cases' seg_tr regime measured ~0.23-0.26 mIoU vs ~0.0 for
    # the random head on these scenes; require a solid absolute margin
    assert trained_miou > base_miou + 0.05, (base_miou, trained_miou)
