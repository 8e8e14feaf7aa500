"""fp32-vs-bf16 numerics tests (SURVEY.md §4: parity gates for the reduced-
precision production path)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import fast, tiny_config
from excel_tpu.engine.pipeline import lam_forward, normalize_images
from excel_tpu.models.params import init_clip_params
from excel_tpu.ops.par import par_refine


def test_bf16_lam_correlation():
    cfg32 = tiny_config()
    cfg16 = fast(cfg32)
    params = init_clip_params(jax.random.PRNGKey(0), cfg32.clip)
    rng = np.random.default_rng(0)
    img = normalize_images(jnp.asarray(
        rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)))
    ta = jnp.asarray(rng.normal(size=(8, cfg32.clip.embed_dim))
                     .astype(np.float32))
    l32, _ = lam_forward(params, img, ta, cfg32)
    l16, _ = lam_forward(params, img, ta, cfg16)
    a = np.asarray(l32, np.float64).ravel()
    b = np.asarray(l16, np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr


def test_bf16_par_close_to_fp32():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 3, 64, 64)).astype(np.float32))
    cam = jnp.asarray(rng.random((1, 4, 64, 64)).astype(np.float32))
    a = np.asarray(par_refine(img, cam, dilations=(1, 2, 4), num_iter=5,
                              use_pallas=False))
    b = np.asarray(par_refine(img, cam, dilations=(1, 2, 4), num_iter=5,
                              use_pallas=False, dtype=jnp.bfloat16))
    # diffusion outputs stay in [0, ~1]; bf16 storage error accumulates to
    # ~1e-2 absolute over 5 iterations
    assert np.abs(a - b).max() < 0.05
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
