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
