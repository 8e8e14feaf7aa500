"""Numerical parity of the JAX surgery-CLIP against the reference torch code.

Uses a small randomly-initialized reference ExCEL_CLIP
(/root/reference/clip/clip_surgery_model.py) as the oracle: convert its
state dict, run both forwards, compare features / attention / projections.
Skipped when the reference tree is not mounted.
"""
import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from excel_tpu.config import ClipConfig
from excel_tpu.models.clip import encode_image, text_forward, vision_forward
from excel_tpu.models.params import convert_torch_state_dict

REF_PATH = "/root/reference/clip/clip_surgery_model.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def oracle():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("_ref_surgery", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    model = mod.ExCEL_CLIP(
        embed_dim=64, image_resolution=64, vision_layers=8, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=1000,
        transformer_width=64, transformer_heads=2, transformer_layers=3,
    ).float().eval()

    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    # architecture surgery on the last blocks (requests 6, replaces 5 —
    # effective behavior, clip_surgery_model.py:399)
    model.visual.reload_self_attn(layers=6, feat_size=4, mode="infer")

    cfg = ClipConfig(
        image_size=64, patch_size=16, vision_width=64, vision_layers=8,
        vision_heads=1, embed_dim=64, pretrain_grid=4, surgery_blocks=5,
        context_length=77, vocab_size=1000, text_width=64, text_heads=2,
        text_layers=3,
    )
    params = convert_torch_state_dict(sd, cfg)
    return torch, model, cfg, params


def _rand_img(torch, b, size, seed=1):
    g = torch.Generator().manual_seed(seed)
    return torch.rand(b, 3, size, size, generator=g) * 2 - 1


def test_vision_forward_parity(oracle):
    torch, model, cfg, params = oracle
    img = _rand_img(torch, 2, 64)
    with torch.no_grad():
        x_t, attn_t, feats_t = model.visual(img, return_weights=True)
    out = vision_forward(params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), cfg)

    np.testing.assert_allclose(out["projected"], x_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        out["attn"], torch.stack(attn_t).numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        out["feats"], torch.stack(feats_t).numpy(), atol=2e-5, rtol=1e-4)


def test_vision_pos_embedding_interpolation(oracle):
    """Feed a size whose grid differs from the pretained table (4 -> 6)."""
    torch, model, cfg, params = oracle
    img = _rand_img(torch, 1, 96, seed=2)
    with torch.no_grad():
        x_t, _, _ = model.visual(img, return_weights=True)
    out = vision_forward(params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), cfg)
    assert out["projected"].shape == (1, 37, 64)
    np.testing.assert_allclose(out["projected"], x_t.numpy(), atol=2e-5, rtol=1e-4)


def test_vision_ex_feats_calibration_parity(oracle):
    torch, model, cfg, params = oracle
    img = _rand_img(torch, 2, 64, seed=3)
    g = torch.Generator().manual_seed(4)
    ex = torch.rand(2, 8, 4, 4, generator=g)
    with torch.no_grad():
        x_t, attn_t, _ = model.visual(img, return_weights=True, ex_feats=ex)
    out = vision_forward(
        params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), cfg,
        ex_feats=jnp.asarray(ex.numpy()))
    np.testing.assert_allclose(out["projected"], x_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        out["attn"], torch.stack(attn_t).numpy(), atol=2e-5, rtol=1e-4)


def test_token_dim_normalization(oracle):
    """generate_clip_fts normalizes over the TOKEN dim (clip/clip.py:353)."""
    torch, model, cfg, params = oracle
    img = _rand_img(torch, 1, 64, seed=5)
    with torch.no_grad():
        x_t, _, _ = model.visual(img, return_weights=True)
        ref = (x_t / x_t.norm(dim=1, keepdim=True)).numpy()
    out = encode_image(params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(out["projected"], ref, atol=2e-5, rtol=1e-4)


def test_text_forward_parity(oracle):
    torch, model, cfg, params = oracle
    rng = np.random.default_rng(0)
    tokens = np.zeros((4, 77), dtype=np.int64)
    for i in range(4):
        n = rng.integers(5, 20)
        tokens[i, :n] = rng.integers(1, 900, size=n)
        tokens[i, n - 1] = 999  # EOT = max id, pooled via argmax
    with torch.no_grad():
        ref = model.encode_text(torch.from_numpy(tokens)).numpy()
    mine = text_forward(params, jnp.asarray(tokens), cfg)
    np.testing.assert_allclose(mine, ref, atol=2e-5, rtol=1e-4)


def _rand_tokens(rng, n, vocab=1000):
    """[n, 77] int64 token rows with a max-id EOT (pooled via argmax)."""
    toks = np.zeros((n, 77), dtype=np.int64)
    for i in range(n):
        ln = rng.integers(5, 20)
        toks[i, :ln] = rng.integers(1, vocab - 100, size=ln)
        toks[i, ln - 1] = vocab - 1
    return toks


def test_imagenet_template_list_golden(oracle):
    """Bundled IMAGENET_PROMPT_TEMPLATES == the reference default
    (clip/clip.py:252-269, prompt_templates=None path)."""
    torch, model, cfg, params = oracle
    from ref_oracle import load_ref_module
    from excel_tpu.text.class_names import IMAGENET_PROMPT_TEMPLATES

    refclip = load_ref_module("clip/clip.py", "clip")
    captured = []
    orig_tokenize = refclip.tokenize
    try:
        def spy_tokenize(prompts):
            captured.append(list(prompts))
            return torch.zeros(len(prompts), 77, dtype=torch.long)

        refclip.tokenize = spy_tokenize
        fake = type("M", (), {"encode_text":
                              staticmethod(lambda t: torch.ones(t.shape[0], 8))})
        refclip.encode_text_with_prompt_ensemble(fake, ["dog"], "cpu")
    finally:
        refclip.tokenize = orig_tokenize

    assert len(IMAGENET_PROMPT_TEMPLATES) == 85
    assert captured[0] == [t.format("dog") for t in IMAGENET_PROMPT_TEMPLATES]


def test_prompt_ensemble_parity(oracle):
    """encode_text_ensemble matches the reference's normalize->mean->normalize
    chain through encode_text_with_prompt_ensemble on the tiny oracle model."""
    torch, model, cfg, params = oracle
    from ref_oracle import load_ref_module
    from excel_tpu.models.clip import encode_text_ensemble

    refclip = load_ref_module("clip/clip.py", "clip")
    rng = np.random.default_rng(7)
    classes = ["aa", "bb", "cc"]
    templates = ["a photo of a {}.", "the origami {}.",
                 "itap of a {}.", "a {} in a video game."]
    # prompt string -> pre-made token row (bypasses the real BPE vocab,
    # which exceeds the tiny oracle's vocab_size=1000)
    table = {t.format(c): _rand_tokens(rng, 1)[0]
             for c in classes for t in templates}

    orig_tokenize = refclip.tokenize
    try:
        refclip.tokenize = lambda prompts: torch.from_numpy(
            np.stack([table[p] for p in prompts]))
        with torch.no_grad():
            ref = refclip.encode_text_with_prompt_ensemble(
                model, classes, "cpu", prompt_templates=templates).numpy()
    finally:
        refclip.tokenize = orig_tokenize

    toks = np.stack([[table[t.format(c)] for t in templates]
                     for c in classes])                      # [C, T, 77]
    mine = encode_text_ensemble(params, jnp.asarray(toks), cfg)
    np.testing.assert_allclose(mine, ref, atol=2e-5, rtol=1e-4)
