"""Fused surgery-attention kernel: interpret-mode parity vs the jnp path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import tiny_config
from excel_tpu.models.clip import vision_forward
from excel_tpu.models.params import init_clip_params


def _cfgs():
    cfg = tiny_config().clip
    return cfg, dataclasses.replace(cfg, fused_attention="interpret")


def test_fused_surgery_attention_parity():
    cfg, fused = _cfgs()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    a = vision_forward(params, img, cfg)
    b = vision_forward(params, img, fused)
    for key in ("projected", "attn", "feats"):
        np.testing.assert_allclose(
            np.asarray(a[key], np.float32), np.asarray(b[key], np.float32),
            atol=5e-6, err_msg=key)


def test_fused_surgery_attention_ex_feats_parity():
    cfg, fused = _cfgs()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    ex = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.vision_width, 4, 4))
    a = vision_forward(params, img, cfg, ex_feats=ex)
    b = vision_forward(params, img, fused, ex_feats=ex)
    np.testing.assert_allclose(np.asarray(a["projected"], np.float32),
                               np.asarray(b["projected"], np.float32),
                               atol=5e-6)
