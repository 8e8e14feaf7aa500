"""Evaluation-engine tests: all three protocols on tiny config + synthetic
data; canvas machinery exactness."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from excel_tpu.config import tiny_config
from excel_tpu.data import EvalDataset, VocDataset
from excel_tpu.data.resize import resize_bilinear
from excel_tpu.data.synthetic import make_voc_tree
from excel_tpu.engine.evaluate import (run_lam_eval, run_msc_seg_eval,
                                       run_validation)
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import init_clip_params


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, eval_pad=96))
    root = str(tmp_path_factory.mktemp("voc"))
    split_dir = make_voc_tree(root, num_images=5, seed=0,
                              num_fg=cfg.num_fg, size_range=(48, 96))
    base = VocDataset(root, split_dir, "val", "val")
    base.num_fg = cfg.num_fg
    dataset = EvalDataset(base)
    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    params = init_excel_params(key, cfg, clip_params)
    text_attr = jnp.asarray(np.random.default_rng(0).normal(
        size=(cfg.num_fg + 3, cfg.clip.embed_dim)).astype(np.float32))
    return cfg, params, dataset, text_attr


def test_run_lam_eval_training_free(setup):
    cfg, params, dataset, text_attr = setup
    scores = run_lam_eval({"clip": params["clip"]}, dataset, text_attr, cfg,
                          mode="training_free", batch_size=2)
    assert 0.0 <= scores["miou"] <= 1.0
    assert len(scores["iou"]) == cfg.num_classes


def test_run_lam_eval_trained(setup):
    cfg, params, dataset, text_attr = setup
    scores = run_lam_eval(params, dataset, text_attr, cfg, mode="trained",
                          batch_size=2)
    assert 0.0 <= scores["miou"] <= 1.0


@pytest.mark.slow
def test_run_lam_eval_crf_tpu(setup):
    """crf_tpu=True: (scores, crf_scores) pair; the raw scores equal the
    plain sweep's bitwise; the fused hist path equals the dump-branch path
    (both go through lam_crf_refine); long_range composes. (slow: four
    full sweeps, ~7 min on the 1-core CPU mesh.)"""
    import dataclasses

    cfg, params, dataset, text_attr = setup
    p = {"clip": params["clip"]}
    plain = run_lam_eval(p, dataset, text_attr, cfg, mode="training_free",
                         batch_size=2)
    scores, crf_scores = run_lam_eval(p, dataset, text_attr, cfg,
                                      mode="training_free", batch_size=2,
                                      crf_tpu=True)
    np.testing.assert_equal(scores, plain)     # raw branch untouched
    assert 0.0 <= crf_scores["miou"] <= 1.0
    assert crf_scores["miou"] != scores["miou"]    # the CRF branch is live
    # dump branch (save_lam_crf forces the unfused path) must agree
    scores2, crf_scores2 = run_lam_eval(p, dataset, text_attr, cfg,
                                        mode="training_free", batch_size=2,
                                        crf_tpu=True,
                                        save_lam_crf=lambda n, v, k: None)
    np.testing.assert_equal(crf_scores2, crf_scores)
    # the NON-default fine-only setting composes in-program too (the runs
    # above already exercise long_range=True — the production default)
    assert cfg.crf.long_range
    cfg_f = dataclasses.replace(
        cfg, crf=dataclasses.replace(cfg.crf, long_range=False))
    _, crf_f = run_lam_eval(p, dataset, text_attr, cfg_f,
                            mode="training_free", batch_size=2,
                            crf_tpu=True)
    assert 0.0 <= crf_f["miou"] <= 1.0


def test_run_validation(setup):
    cfg, params, dataset, text_attr = setup
    pseudo, seg = run_validation(params, dataset, text_attr, cfg,
                                 batch_size=2)
    assert 0.0 <= pseudo["miou"] <= 1.0
    assert 0.0 <= seg["miou"] <= 1.0


def test_run_msc_seg_eval(setup):
    cfg, params, dataset, text_attr = setup
    # tiny model: patch 16, image 64; scales must keep size % 16 == 0
    scores = run_msc_seg_eval(params, dataset, text_attr, cfg,
                              scales=(1.0, 0.75, 1.25), batch_size=2)
    assert 0.0 <= scores["miou"] <= 1.0


def test_msc_outputs_saved(setup, tmp_path):
    cfg, params, dataset, text_attr = setup
    logits_out, preds_out = {}, {}
    logit_calls, pred_calls = [], []
    scores = run_msc_seg_eval(
        params, dataset, text_attr, cfg, scales=(1.0,), batch_size=2,
        save_logits=lambda n, l: (logit_calls.append(n),
                                  logits_out.__setitem__(n, l)),
        save_pred=lambda n, p: (pred_calls.append(n),
                                preds_out.__setitem__(n, p)))
    # exactly one emission per dataset image — remainder-padding duplicates
    # must not re-emit files (5 images, batch 2 -> one padded batch)
    assert sorted(logit_calls) == sorted(
        dataset[i]["name"] for i in range(len(dataset)))
    assert len(pred_calls) == len(dataset)
    name = next(iter(logits_out))
    assert logits_out[name].shape[0] == cfg.num_classes
    assert preds_out[name].shape == logits_out[name].shape[1:]
    # the dump sweep's hist is the same program — scores must match the
    # hist-only sweep exactly
    plain = run_msc_seg_eval(params, dataset, text_attr, cfg, scales=(1.0,),
                             batch_size=2)
    assert plain["miou"] == scores["miou"]


def test_msc_saved_logits_are_pre_crf(setup):
    """crf_tpu=True: saved logits must be the PRE-CRF fused logits (the
    reference saves raw logits and runs its host CRF on those,
    tools/infer_seg_voc.py:90-91; saving post-CRF Q would double-CRF), while
    save_pred receives the post-CRF argmax."""
    cfg, params, dataset, text_attr = setup
    raw_logits, crf_logits, crf_preds = {}, {}, {}
    run_msc_seg_eval(params, dataset, text_attr, cfg, scales=(1.0,),
                     batch_size=2,
                     save_logits=lambda n, l: raw_logits.__setitem__(n, l))
    run_msc_seg_eval(params, dataset, text_attr, cfg, scales=(1.0,),
                     batch_size=2, crf_tpu=True,
                     save_logits=lambda n, l: crf_logits.__setitem__(n, l),
                     save_pred=lambda n, p: crf_preds.__setitem__(n, p))
    assert sorted(raw_logits) == sorted(crf_logits)
    for n in raw_logits:
        np.testing.assert_array_equal(raw_logits[n], crf_logits[n])
    # preds reflect the on-TPU CRF: at least one image's argmax may move,
    # but every pred is still a valid label map of the right shape
    for n, p in crf_preds.items():
        assert p.shape == crf_logits[n].shape[1:]
        assert p.min() >= 0 and p.max() < cfg.num_classes


def test_lam_save_cam_counts(setup):
    """save_cam fires once per dataset image — padding rows are skipped."""
    cfg, params, dataset, text_attr = setup
    calls = []
    run_lam_eval({"clip": params["clip"]}, dataset, text_attr, cfg,
                 mode="training_free", batch_size=2,
                 save_cam=lambda n, img, cams: calls.append(n))
    assert sorted(calls) == sorted(
        dataset[i]["name"] for i in range(len(dataset)))


def test_perfect_model_gets_perfect_miou(setup):
    """Sanity: feed GT as 'predictions' through the hist path via a stub."""
    cfg, params, dataset, text_attr = setup
    from excel_tpu.utils.metrics import init_hist, scores_from_hist, update_hist
    hist = init_hist(cfg.num_classes)
    for i in range(len(dataset)):
        s = dataset[i]
        hist = update_hist(hist, s["label"], s["label"], cfg.num_classes)
    assert scores_from_hist(np.asarray(hist))["miou"] == 1.0


@pytest.mark.slow
def test_lam_eval_data_parallel_matches(setup):
    """8-way sharded eval sweep == single-device sweep (hist is exact)."""
    from excel_tpu.parallel import make_mesh, replicate
    cfg, params, dataset, text_attr = setup
    mesh = make_mesh()
    p = {"clip": params["clip"]}
    a = run_lam_eval(p, dataset, text_attr, cfg, mode="training_free",
                     batch_size=8)
    b = run_lam_eval(replicate(p, mesh), dataset,
                     replicate(text_attr, mesh), cfg, mode="training_free",
                     batch_size=8, mesh=mesh)
    assert abs(a["miou"] - b["miou"]) < 1e-6


@pytest.mark.slow
def test_bucketed_eval_exact_across_buckets(tmp_path):
    """Mixed image sizes spanning several canvas buckets: the bucketed sweep's
    streaming hist must be identical to a single-canvas sweep."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, eval_pad=256))
    root = str(tmp_path)
    split_dir = make_voc_tree(root, num_images=7, seed=3, num_fg=cfg.num_fg,
                              size_range=(80, 250))
    base = VocDataset(root, split_dir, "val", "val")
    base.num_fg = cfg.num_fg
    dataset = EvalDataset(base)
    # sanity: sizes really span more than one bucket
    from excel_tpu.engine.evaluate import _bucket_of
    buckets = {_bucket_of(dataset[i], 256) for i in range(len(dataset))}
    assert len(buckets) > 1, buckets

    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    text_attr = jnp.asarray(np.random.default_rng(0).normal(
        size=(cfg.num_fg + 3, cfg.clip.embed_dim)).astype(np.float32))

    scores = run_lam_eval({"clip": clip_params}, dataset, text_attr, cfg,
                          mode="training_free", batch_size=3)
    # force everything through ONE max-size bucket by monkeypatching
    import excel_tpu.engine.evaluate as ev
    orig = ev._bucket_of
    ev._bucket_of = lambda s, pad, q=128: (256, 256)
    try:
        scores_single = run_lam_eval({"clip": clip_params}, dataset,
                                     text_attr, cfg, mode="training_free",
                                     batch_size=3)
    finally:
        ev._bucket_of = orig
    assert abs(scores["miou"] - scores_single["miou"]) < 1e-9, (
        scores["miou"], scores_single["miou"])


@pytest.mark.slow
def test_class_slot_compaction_exact(setup):
    """lam_eval_step with class_slots >= the batch's max label cardinality
    must equal the full-channel path pixel for pixel (the compacted stack
    mirrors the reference's present-classes-only refinement)."""
    from excel_tpu.engine.evaluate import lam_eval_step

    cfg, params, dataset, text_attr = setup
    rng = np.random.default_rng(3)
    b, size = 3, cfg.clip.image_size
    images = jnp.asarray(rng.random((b, size, size, 3), np.float32) * 255)
    cls = np.zeros((b, cfg.num_fg), np.float32)
    cls[0, [0]] = 1.0                       # 1 class
    cls[1, [1, 3]] = 1.0                    # 2 classes
    cls[2, [0, 2, 4]] = 1.0                 # 3 classes (cap)
    cls = jnp.asarray(cls)
    canvas = (64, 64)
    valid = jnp.asarray([[64, 64], [50, 60], [33, 64]], jnp.int32)

    full = lam_eval_step(params, images, cls, valid, text_attr,
                         cfg=cfg, canvas=canvas)
    for slots in (3, 4, cfg.num_fg):
        compact = lam_eval_step(params, images, cls, valid, text_attr,
                                cfg=cfg, canvas=canvas, class_slots=slots)
        assert np.array_equal(np.asarray(full), np.asarray(compact)), slots


def test_class_slot_index_ordering():
    """Present classes come first in ascending class order; the mask marks
    real vs padding slots."""
    from excel_tpu.ops.labels import class_slot_index

    cls = jnp.asarray([[0, 1, 0, 1, 0], [1, 0, 0, 0, 0]], jnp.float32)
    idx, mask = class_slot_index(cls, 3)
    assert idx.tolist() == [[1, 3, 0], [0, 1, 2]]
    assert mask.tolist() == [[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]]


class _KillAfter:
    """Progress callback that simulates a mid-sweep kill."""

    def __init__(self, n_images):
        self.n = n_images
        self.seen = 0

    def __call__(self, n):
        self.seen += n
        if self.seen >= self.n:
            raise KeyboardInterrupt


def test_lam_sweep_resumes_from_hist_checkpoint(setup, tmp_path):
    cfg, params, dataset, text_attr = setup
    p = {"clip": params["clip"]}
    full = run_lam_eval(p, dataset, text_attr, cfg, mode="training_free",
                        batch_size=1)

    ck = str(tmp_path / "lam_hist.npz")
    with pytest.raises(KeyboardInterrupt):
        run_lam_eval(p, dataset, text_attr, cfg, mode="training_free",
                     batch_size=1, checkpoint_path=ck, checkpoint_every=1,
                     progress=_KillAfter(3))
    assert (tmp_path / "lam_hist.npz").exists()
    import numpy as _np
    saved = _np.load(ck)
    assert 0 < int(saved["done"]) < len(dataset)

    resumed = run_lam_eval(p, dataset, text_attr, cfg, mode="training_free",
                           batch_size=1, checkpoint_path=ck)
    for k in range(cfg.num_classes):
        assert resumed["iou"][k] == full["iou"][k] or (
            _np.isnan(resumed["iou"][k]) and _np.isnan(full["iou"][k]))
    assert not (tmp_path / "lam_hist.npz").exists()   # cleaned when complete

    # a protocol change invalidates the checkpoint (fingerprint mismatch)
    _np.savez(str(tmp_path / "stale"), hist=_np.ones((3, 3)), done=2,
              fingerprint="other")


def test_msc_sweep_resumes_from_hist_checkpoint(setup, tmp_path):
    cfg, params, dataset, text_attr = setup
    scales = (1.0, 0.5)
    full = run_msc_seg_eval(params, dataset, text_attr, cfg, scales=scales,
                            batch_size=1)
    ck = str(tmp_path / "msc_hist.npz")
    with pytest.raises(KeyboardInterrupt):
        run_msc_seg_eval(params, dataset, text_attr, cfg, scales=scales,
                         batch_size=1, checkpoint_path=ck,
                         checkpoint_every=1, progress=_KillAfter(2))
    resumed = run_msc_seg_eval(params, dataset, text_attr, cfg, scales=scales,
                               batch_size=1, checkpoint_path=ck)
    import numpy as _np
    for k in range(cfg.num_classes):
        assert resumed["iou"][k] == full["iou"][k] or (
            _np.isnan(resumed["iou"][k]) and _np.isnan(full["iou"][k]))


def test_bucketed_batches_slot_homogeneous(setup):
    """_bucketed_batches with slot grouping: every yielded batch's real
    samples share one slot bucket (the batch's compiled specialization is
    sized by its max per-image class count — one 4-class image must not drag
    1-class images onto the big-slot program), and each dataset sample
    appears exactly once."""
    from excel_tpu.engine.evaluate import _bucketed_batches, _slot_need_bucket
    cfg, params, dataset, text_attr = setup
    buckets = cfg.refine.slot_buckets
    seen = []
    for canvas, samples in _bucketed_batches(
            dataset, 2, cfg.data.eval_pad,
            slot_buckets=buckets, num_fg=cfg.num_fg):
        real = [s for s in samples if not s.get("_pad")]
        assert len(samples) == 2
        slots = {_slot_need_bucket(int(np.asarray(s["cls_label"] > 0).sum()),
                                   cfg.num_fg, buckets) for s in real}
        assert len(slots) <= 1
        seen += [s["name"] for s in real]
    assert sorted(seen) == sorted(dataset[i]["name"]
                                  for i in range(len(dataset)))


@pytest.mark.slow
def test_slot_grouped_eval_matches_ungrouped(setup):
    """Slot-homogeneous batching + slot compaction is EXACT: the grouped
    sweep's scores equal a no-bucket sweep that runs every image on the
    full class stack (per-image compute is independent of batch
    composition; the hist is order-invariant; padding rows carry 255-GT)."""
    cfg, params, dataset, text_attr = setup
    p = {"clip": params["clip"]}
    a = run_lam_eval(p, dataset, text_attr, cfg, mode="training_free",
                     batch_size=2)
    cfg_ng = dataclasses.replace(
        cfg, refine=dataclasses.replace(cfg.refine, slot_buckets=()))
    b = run_lam_eval(p, dataset, text_attr, cfg_ng, mode="training_free",
                     batch_size=2)
    assert a["miou"] == b["miou"]
    np.testing.assert_array_equal(np.asarray(a["iou"]), np.asarray(b["iou"]))
