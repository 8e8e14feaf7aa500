"""Native dense-CRF tests (behavioral — pydensecrf is not available here;
correctness is established by the mean-field/Potts properties the reference
relies on)."""
import numpy as np
import pytest

from excel_tpu.crf import DenseCRF, crf_batch, crf_inference


@pytest.fixture(scope="module")
def noisy_two_region():
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


def test_crf_denoises_along_edges(noisy_two_region):
    image, probs, gt = noisy_two_region
    crf = DenseCRF(iter_max=10, pos_w=3, pos_xy_std=1, bi_w=4,
                   bi_xy_std=67, bi_rgb_std=3)
    out = crf(image, probs)
    assert out.shape == probs.shape
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-4)
    acc_before = (probs.argmax(0) == gt).mean()
    acc_after = (out.argmax(0) == gt).mean()
    assert acc_after > 0.98 > acc_before


def test_crf_identity_on_confident_input(noisy_two_region):
    """Confident, edge-aligned predictions must survive the CRF."""
    image, _, gt = noisy_two_region
    C = 21
    probs = np.full((C,) + gt.shape, 1e-4, np.float32)
    probs[0] = np.where(gt == 0, 0.99, 1e-4)
    probs[1] = np.where(gt == 1, 0.99, 1e-4)
    probs /= probs.sum(0, keepdims=True)
    out = DenseCRF()(image, probs)
    assert (out.argmax(0) == gt).mean() > 0.995


def test_crf_inference_paramset(noisy_two_region):
    image, probs, gt = noisy_two_region
    out = crf_inference(image, probs, t=10)
    assert (out.argmax(0) == gt).mean() > 0.95


def test_crf_batch(noisy_two_region):
    image, probs, _ = noisy_two_region
    crf = DenseCRF(iter_max=2)
    outs = crf_batch([(image, probs)] * 3, crf, num_threads=2)
    assert len(outs) == 3
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-6)


@pytest.mark.crf_oracle
def test_crf_matches_pydensecrf(noisy_two_region):
    """Numerical cross-check against pydensecrf itself (the reference's
    native CRF, utils/dcrf.py:1-68). Auto-skips where pydensecrf is not
    installable (this build env has zero egress); on hosts that have it,
    this turns 'implemented from the papers' into 'verified against the
    original': same unary, same Gaussian+bilateral pairwise, 10 mean-field
    iterations, argmax agreement ~everywhere and tight Q agreement."""
    dcrf = pytest.importorskip("pydensecrf.densecrf")
    if getattr(dcrf, "__excel_stub__", False):
        pytest.skip("pydensecrf stubbed by ref_oracle (not a real install)")
    from pydensecrf.utils import unary_from_softmax

    image, probs, _ = noisy_two_region
    c, h, w = probs.shape
    params = dict(iter_max=10, pos_w=3.0, pos_xy_std=1.0, bi_w=4.0,
                  bi_xy_std=67.0, bi_rgb_std=3.0)

    d = dcrf.DenseCRF2D(w, h, c)
    d.setUnaryEnergy(unary_from_softmax(probs))
    d.addPairwiseGaussian(sxy=params["pos_xy_std"], compat=params["pos_w"])
    d.addPairwiseBilateral(sxy=params["bi_xy_std"],
                           srgb=params["bi_rgb_std"],
                           rgbim=np.ascontiguousarray(image),
                           compat=params["bi_w"])
    ref_q = np.array(d.inference(params["iter_max"])).reshape(c, h, w)

    ours_q = DenseCRF(**params)(image, probs)

    # permutohedral implementations differ in lattice hashing/blur order:
    # exact bit equality is not expected, but labels must agree essentially
    # everywhere and marginals closely (the reference consumes argmax only)
    agree = (ours_q.argmax(0) == ref_q.argmax(0)).mean()
    assert agree > 0.99, agree
    assert np.abs(ours_q - ref_q).mean() < 0.02
