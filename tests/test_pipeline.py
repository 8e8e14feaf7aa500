"""End-to-end smoke tests: shapes, jit-ability, and determinism of the
training-free and trained pipelines on a tiny config."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from excel_tpu.config import ClipConfig, ExcelConfig, HeadConfig, RefineConfig
from excel_tpu.engine.pipeline import (trained_lam_step, training_free_step)
from excel_tpu.models.excel import excel_forward, init_excel_params
from excel_tpu.models.params import init_clip_params


@pytest.fixture(scope="module")
def tiny():
    cfg = ExcelConfig(
        clip=ClipConfig(image_size=64, patch_size=16, vision_width=64,
                        vision_layers=6, vision_heads=2, embed_dim=32,
                        pretrain_grid=4, surgery_blocks=3, vocab_size=512,
                        text_width=32, text_heads=2, text_layers=2),
        head=HeadConfig(embedding_dim=32, in_channels=64, num_blocks=6,
                        decoder_layers=2, decoder_heads=4),
        refine=RefineConfig(par_dilations=(1, 2, 4), par_iters=4),
        num_classes=6,
        num_attr_clusters=16,
    )
    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip)
    params = init_excel_params(jax.random.PRNGKey(1), cfg, clip_params)
    text_attr = jax.random.normal(jax.random.PRNGKey(2), (9, 32))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=1, keepdims=True)
    return cfg, params, text_attr


def test_excel_forward_shapes(tiny):
    cfg, params, text_attr = tiny
    imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    out = excel_forward(params, imgs, text_attr, cfg)
    hw = 16
    assert out.segs.shape == (2, hw, 6)
    assert out.fused.shape == (2, hw, 32)
    assert out.lams.shape == (2, hw, 5)
    assert out.attn_weights.shape == (6, 2, hw + 1, hw + 1)
    assert out.attn_pred.shape == (2, hw, hw)
    assert out.seg_attn.shape == (2, 2, hw, hw)
    # calibrated LAM-only pass
    lams2 = excel_forward(params, imgs, text_attr, cfg, ex_feats=out.fused)
    assert lams2.shape == (2, hw, 5)


def test_training_free_step(tiny):
    cfg, params, text_attr = tiny
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8)
    cls = jnp.asarray([[1, 0, 1, 0, 0], [0, 1, 0, 0, 1]], jnp.float32)
    labels = training_free_step(params["clip"], jnp.asarray(imgs), cls,
                                text_attr, cfg)
    labels = np.asarray(labels)
    assert labels.shape == (2, 64, 64)
    # labels only from {0} + present classes
    assert set(np.unique(labels[0])) <= {0, 1, 3}
    assert set(np.unique(labels[1])) <= {0, 2, 5}
    # deterministic
    again = np.asarray(training_free_step(params["clip"], jnp.asarray(imgs),
                                          cls, text_attr, cfg))
    np.testing.assert_array_equal(labels, again)


def test_trained_lam_step(tiny):
    cfg, params, text_attr = tiny
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8)
    cls = jnp.asarray([[1, 0, 0, 1, 0], [0, 0, 1, 0, 0]], jnp.float32)
    labels, segs = trained_lam_step(params, jnp.asarray(imgs), cls,
                                    text_attr, cfg)
    assert labels.shape == (2, 64, 64)
    assert segs.shape == (2, 16, 6)
