"""On-TPU convolutional mean-field CRF: behavior + agreement with the
native C++ lattice CRF + Pallas path parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from excel_tpu.crf import DenseCRF
from excel_tpu.ops.crf_tpu import crf_meanfield


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    H, W, C = 96, 128, 21
    image = np.zeros((H, W, 3), np.uint8)
    image[:, : W // 2] = (200, 30, 30)
    image[:, W // 2:] = (30, 30, 200)
    image += rng.integers(0, 15, image.shape).astype(np.uint8)
    gt = np.zeros((H, W), np.int64)
    gt[:, W // 2:] = 1
    conf = 0.55 + 0.25 * rng.random((H, W)).astype(np.float32)
    flip = rng.random((H, W)) < 0.25
    noisy = np.where(flip, 1 - gt, gt)
    probs = np.full((C, H, W), 0.2 / (C - 1), np.float32)
    probs[0] = np.where(noisy == 0, conf, (1 - conf) / 2)
    probs[1] = np.where(noisy == 1, conf, (1 - conf) / 2)
    probs /= probs.sum(0, keepdims=True)
    return image, probs, gt


@pytest.mark.slow
def test_meanfield_denoises_and_agrees_with_lattice(scene):
    image, probs, gt = scene
    q = np.asarray(crf_meanfield(jnp.asarray(image[None]),
                                 jnp.asarray(probs[None]),
                                 use_pallas=False))[0]
    np.testing.assert_allclose(q.sum(0), 1.0, atol=1e-4)
    assert (q.argmax(0) == gt).mean() > 0.98
    q_cpp = DenseCRF(iter_max=10, pos_w=3, pos_xy_std=1, bi_w=4,
                     bi_xy_std=67, bi_rgb_std=3)(image, probs)
    agreement = (q.argmax(0) == q_cpp.argmax(0)).mean()
    assert agreement > 0.97, agreement


def test_meanfield_pallas_parity(scene):
    image, probs, _ = scene
    # small dilation set keeps interpret mode fast
    a = crf_meanfield(jnp.asarray(image[None]), jnp.asarray(probs[None]),
                      iters=2, dilations=(1, 2, 4), use_pallas=False)
    b = crf_meanfield(jnp.asarray(image[None]), jnp.asarray(probs[None]),
                      iters=2, dilations=(1, 2, 4), use_pallas="interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("kind,pset,max_dis,max_iou_d", [
    # measured bounds (tools/exp_crf_agreement.py, 2026-08-19, recorded in
    # PARITY.md) with ~2x headroom: argmax disagreement % vs the C++
    # lattice and max per-class IoU delta, per scene type x parameter set.
    ("blobs", "voc", 3.0, 0.06),
    ("blobs", "msc_dev", 4.0, 0.11),
    ("thin", "voc", 4.0, 0.18),
    ("thin", "msc_dev", 2.5, 0.12),
    ("texture", "voc", 1.0, 0.01),
    ("texture", "msc_dev", 6.0, 0.14),
])
def test_meanfield_lattice_agreement_bounds(kind, pset, max_dis, max_iou_d):
    """Quantified agreement between the on-TPU conv mean-field and the C++
    permutohedral lattice over structured scenes at the reference's
    parameter sets (infer_seg_voc.py:113-120 / test_msc_flip_voc.py:144-151).
    Regression guard for the ring-quadrature sampling weights."""
    import sys
    sys.path.insert(0, "tools")
    from exp_crf_agreement import PARAM_SETS, compare
    from excel_tpu.data.synthetic import crf_scene

    image, gt, probs = crf_scene(kind, seed=0, num_classes=21)
    r = compare(image, gt, probs, PARAM_SETS[pset], 21)
    assert r["disagree_pct"] <= max_dis, r
    assert r["max_iou_delta"] <= max_iou_d, r


@pytest.mark.slow
@pytest.mark.parametrize("kind,max_dis,max_iou_d", [
    # measured 2026-08-20 (same tool, voc params, coarse s8 d9-21 with
    # moment-matched weights) with ~2x headroom: blobs 1.26/0.024,
    # thin 2.03/0.138, texture 2.30/0.034. The long-range level is the
    # production DEFAULT, so the stress scenes need their own bounds.
    ("blobs", 3.0, 0.06),
    ("thin", 4.5, 0.30),
    ("texture", 5.0, 0.08),
])
def test_meanfield_long_range_stress_bounds(kind, max_dis, max_iou_d):
    import sys
    sys.path.insert(0, "tools")
    from exp_crf_agreement import PARAM_SETS, compare
    from excel_tpu.data.synthetic import crf_scene

    image, gt, probs = crf_scene(kind, seed=0, num_classes=21)
    r = compare(image, gt, probs, PARAM_SETS["voc"], 21,
                mf_kwargs={"coarse_stride": 8})
    assert r["disagree_pct"] <= max_dis, r
    assert r["max_iou_delta"] <= max_iou_d, r


@pytest.mark.slow
def test_meanfield_protocol_regime_agreement_bounds():
    """PROTOCOL-regime agreement (VERDICT r4 Weak #4): unaries produced by
    the actual pipeline on synthetic scenes — MSC seg softmax (random +
    briefly-trained head) and training-free LAM stacks — instead of
    injected label noise. Measured 2026-08-20 (tools/exp_crf_agreement.py
    run_protocol_table, 4 images): worst disagree seg 4.5% / seg_tr 15.7% /
    lam 11.0%; worst maxIoU_d 0 / 0.47 / 0.14. NOTE the honest finding:
    the protocol regime disagrees MORE than the r4 stress scenes (<=5.9%)
    — coarse peaked logits drive the CRF into long-range regimes where the
    +-55 px truncated bilateral support diverges from the dense lattice.
    crf_tpu stays the fast approximate alternative; the reference-parity
    path is the host lattice (--crf). Bounds below are the 2-image subset's
    own measurements (seg 4.5 / seg_tr 7.9 / lam 11.0) with ~1.5x headroom,
    as a regression guard."""
    import sys
    sys.path.insert(0, "tools")
    from exp_crf_agreement import PARAM_SETS, compare, pipeline_cases

    worst = {}
    worst_lr = {}
    for tag, img, gt, probs, map_pred, nc in pipeline_cases(num_images=2):
        r = compare(img, gt, probs, PARAM_SETS["voc"], nc, map_pred=map_pred)
        worst[tag] = max(worst.get(tag, 0.0), r["disagree_pct"])
        r = compare(img, gt, probs, PARAM_SETS["voc"], nc, map_pred=map_pred,
                    mf_kwargs={"coarse_stride": 8})
        worst_lr[tag] = max(worst_lr.get(tag, 0.0), r["disagree_pct"])
    assert worst["seg"] <= 8.0, worst        # measured 4.54
    assert worst["seg_tr"] <= 13.0, worst    # measured 7.92
    assert worst["lam"] <= 17.0, worst       # measured 10.96
    # the moment-matched coarse long-range level must hold its measured
    # 4-10x improvement (2-image subset: 0.01 / 1.51 / 4.02, ~2x headroom)
    assert worst_lr["seg"] <= 1.0, worst_lr
    assert worst_lr["seg_tr"] <= 3.5, worst_lr
    assert worst_lr["lam"] <= 8.0, worst_lr
    assert worst_lr["seg_tr"] < worst["seg_tr"], (worst_lr, worst)


@pytest.mark.slow
def test_meanfield_label_unary_agreement():
    """Label-unary variant (utils/dcrf.py:26-40 parameter set): gt_prob
    unary built from a hard label map, both engines, argmax agreement."""
    import sys
    sys.path.insert(0, "tools")
    from exp_crf_agreement import LABEL_PARAMS, compare, label_probs
    from excel_tpu.data.synthetic import crf_scene

    image, gt, probs = crf_scene("blobs", seed=0, num_classes=21)
    lp = label_probs(probs.argmax(0), 21)
    r = compare(image, gt, lp, LABEL_PARAMS, 21)
    assert r["disagree_pct"] <= 1.0, r        # measured 0.06
    assert r["max_iou_delta"] <= 0.05, r      # measured 0.002


def test_quadrature_weights_cover_rings():
    """One weight per offset, constant within a ring, total = disc area of
    the outermost ring's outer edge (the quadrature is a partition)."""
    from excel_tpu.ops.crf_tpu import (DEFAULT_DILATIONS, _offsets,
                                       _quadrature_weights)
    offs = _offsets(DEFAULT_DILATIONS)
    qw = _quadrature_weights(DEFAULT_DILATIONS)
    assert len(qw) == len(offs)
    by_ring = {}
    for (dy, dx), w in zip(offs, qw):
        by_ring.setdefault(max(abs(dy), abs(dx)), set()).add(round(w, 9))
    assert all(len(ws) == 1 for ws in by_ring.values())   # constant per ring
    ds = sorted(DEFAULT_DILATIONS)
    outer = ds[-1] + (ds[-1] - (ds[-2] + ds[-1]) / 2)
    inner = ds[0] / 2
    np.testing.assert_allclose(sum(qw),
                               np.pi * (outer ** 2 - inner ** 2), rtol=1e-6)


def test_meanfield_coarse_level_runs_and_normalizes(scene):
    """The long-range coarse level (coarse_stride>0): valid probabilities,
    works with per-image valid extents and non-multiple-of-stride shapes,
    and the Pallas fine path composes with it (the coarse message is plain
    XLA in both paths)."""
    image, probs, _ = scene
    q = np.asarray(crf_meanfield(jnp.asarray(image[None]),
                                 jnp.asarray(probs[None]), iters=3,
                                 use_pallas=False, coarse_stride=8))[0]
    np.testing.assert_allclose(q.sum(0), 1.0, atol=1e-4)
    assert not np.isnan(q).any()
    # valid extents not a multiple of the coarse stride (70x100 on 96x128)
    vh = jnp.asarray([[70, 100]], jnp.int32)
    q2 = np.asarray(crf_meanfield(jnp.asarray(image[None]),
                                  jnp.asarray(probs[None]), iters=3,
                                  use_pallas=False, coarse_stride=8,
                                  valid_hw=vh))[0]
    np.testing.assert_allclose(q2.sum(0), 1.0, atol=1e-4)
    assert not np.isnan(q2).any()
    # pallas interpret path parity: identical coarse message on both
    a = crf_meanfield(jnp.asarray(image[None]), jnp.asarray(probs[None]),
                      iters=2, dilations=(1, 2, 4), use_pallas=False,
                      coarse_stride=8)
    b = crf_meanfield(jnp.asarray(image[None]), jnp.asarray(probs[None]),
                      iters=2, dilations=(1, 2, 4), use_pallas="interpret",
                      coarse_stride=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_coarse_moment_matched_attenuation():
    """The coarse cell-pair weight must be moment-matched: between two
    TEXTURED cells with the same mean color, the naive mean-color kernel
    says affinity 1.0 while the dense kernel's pair expectation is tiny
    (σ_rgb=3 vs V≈2000: pairs almost never match). Textured long-range
    affinity must come out far below smooth long-range affinity."""
    from excel_tpu.ops.crf_tpu import COARSE_DILATIONS, crf_meanfield

    rng = np.random.default_rng(3)
    H = W = 96
    # left: flat gray; right: heavy checker texture with the SAME mean
    img = np.full((H, W, 3), 128, np.float32)
    img[:, W // 2:] += rng.choice([-90.0, 90.0], (H, W // 2, 1))
    img = img.astype(np.uint8)
    C = 3
    probs = np.full((C, H, W), 1.0 / C, np.float32)
    # seed class 1 in a far corner of the flat half, class 2 in the far
    # corner of the textured half; long-range coupling should spread the
    # flat seed across the flat half far more than the textured one
    probs[:, :8, :8] = 0.05
    probs[1, :8, :8] = 0.9
    probs[:, :8, -8:] = 0.05
    probs[2, :8, -8:] = 0.9
    q = np.asarray(crf_meanfield(
        jnp.asarray(img[None]), jnp.asarray(probs[None]), iters=5,
        pos_w=0.0, bi_w=4.0, bi_xy_std=67.0, bi_rgb_std=3.0,
        dilations=(1, 2), use_pallas=False, coarse_stride=8,
        coarse_dilations=COARSE_DILATIONS))[0]
    # probe pixels far from both seeds (bottom rows), per half
    flat_gain = q[1, -16:, : W // 2 - 8].mean() - 1.0 / C
    tex_gain = q[2, -16:, W // 2 + 8:].mean() - 1.0 / C
    assert flat_gain > 3 * max(tex_gain, 0.0), (flat_gain, tex_gain)


def test_meanfield_bf16_messages_argmax_agreement(scene):
    """msg_dtype=bf16 (the production fast path, CrfConfig.msg_bf16) agrees
    with the f32 message pass at the argmax level."""
    image, probs, _ = scene
    a = crf_meanfield(jnp.asarray(image[None]), jnp.asarray(probs[None]),
                      iters=4, dilations=(1, 2, 4), use_pallas="interpret")
    b = crf_meanfield(jnp.asarray(image[None]), jnp.asarray(probs[None]),
                      iters=4, dilations=(1, 2, 4), use_pallas="interpret",
                      msg_dtype=jnp.bfloat16)
    agree = (np.asarray(a).argmax(1) == np.asarray(b).argmax(1)).mean()
    assert agree > 0.995, agree
