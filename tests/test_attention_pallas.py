"""Fused surgery-attention kernel: interpret-mode parity vs the jnp path."""
import pytest
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


@pytest.mark.slow
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


def test_surgery_attention_row_chunked_grid():
    """n > 640 routes to the row-chunked grid (used by MSC's 901-token
    scale); padded key columns are masked, outputs cropped back."""
    import numpy as np
    from excel_tpu.models.attention_pallas import fused_surgery_attention

    rng = np.random.default_rng(5)
    b, heads, n, d = 1, 3, 901, 16
    q = jnp.asarray(rng.standard_normal((b, heads, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, heads, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, heads, n, d)).astype(np.float32))
    scale = d ** -0.5

    def sm(a, bb):
        return jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", a, bb) * scale, axis=-1)

    attn_ori = sm(q, k)
    ref_shared = ((sm(q, q) + sm(k, k) + sm(v, v)) / 3.0).sum(1)
    ref_attn = attn_ori.sum(1)
    ref_ctx = jnp.einsum("bhnm,bhmd->bhnd", attn_ori, v)

    shared, attn_sum, ctx = fused_surgery_attention(q, k, v, None,
                                                    interpret=True)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(ref_shared),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(attn_sum), np.asarray(ref_attn),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref_ctx),
                               atol=5e-4)

    # ex_attn branch through the chunked grid
    ex = jnp.asarray(rng.standard_normal((b, n, n)).astype(np.float32))
    shared_ex, _, _ = fused_surgery_attention(q, k, v, ex, interpret=True)
    # ex is added per head before the head-sum -> contributes heads * ex
    np.testing.assert_allclose(np.asarray(shared_ex),
                               np.asarray(ref_shared + heads * ex[0]),
                               atol=5e-5)


def test_plain_attention_rows_hb_matches():
    from excel_tpu.models.attention_pallas import (
        _fused_plain_attention_rows_hb, fused_plain_attention)

    rng = np.random.default_rng(9)
    b, heads, n, d = 2, 3, 150, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, heads, n, d))
                           .astype(np.float32)) for _ in range(3))
    ctx_ref, mean_ref = fused_plain_attention(q, k, v, interpret=True,
                                              need_weights=True)
    ctx, mean = _fused_plain_attention_rows_hb(q, k, v, True, chunk=64,
                                               need_weights=True)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               atol=2e-5)
    ctx2, none = _fused_plain_attention_rows_hb(q, k, v, True, chunk=64,
                                                need_weights=False)
    assert none is None
    np.testing.assert_allclose(np.asarray(ctx2), np.asarray(ctx_ref),
                               atol=2e-5)


def test_attn_mode_mean_matches_stack():
    """attn_mode='mean' must equal the stack's block mean — jnp path
    bitwise, interpret-mode fused path (in-kernel acc aliasing) to fp
    tolerance."""
    cfg, fused = _cfgs()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))

    stack = vision_forward(params, img, cfg)
    ref_mean = np.asarray(stack["attn"], np.float32).mean(axis=0)

    mean_jnp = vision_forward(params, img, cfg, attn_mode="mean")
    np.testing.assert_array_equal(np.asarray(mean_jnp["attn"]), ref_mean)
    np.testing.assert_array_equal(np.asarray(mean_jnp["projected"]),
                                  np.asarray(stack["projected"]))

    mean_fused = vision_forward(params, img, fused, attn_mode="mean")
    np.testing.assert_allclose(np.asarray(mean_fused["attn"]), ref_mean,
                               atol=5e-6)


def test_attn_mode_none_runs_and_matches():
    cfg, fused = _cfgs()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    stack = vision_forward(params, img, cfg)
    for c in (cfg, fused):
        none = vision_forward(params, img, c, attn_mode="none")
        assert none["attn"] is None
        np.testing.assert_allclose(np.asarray(none["projected"], np.float32),
                                   np.asarray(stack["projected"], np.float32),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(none["feats"], np.float32),
                                   np.asarray(stack["feats"], np.float32),
                                   atol=5e-6)


def test_refine_lams_batch_accepts_pre_aggregated_mean():
    from excel_tpu.ops.affinity import refine_lams_batch

    rng = np.random.default_rng(3)
    B, C, g = 2, 4, 4
    hw = g * g
    lams = jnp.asarray(rng.random((B, C, hw)).astype(np.float32))
    stack = jnp.asarray(rng.random((3, B, hw + 1, hw + 1)).astype(np.float32))
    a = refine_lams_batch(lams, stack, 0.5, (g, g), attn_layers=3)
    b = refine_lams_batch(lams, stack.mean(axis=0), 0.5, (g, g),
                          attn_layers=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
