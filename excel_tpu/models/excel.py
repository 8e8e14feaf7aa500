"""ExCEL composition root (reference model/model_excel.py).

Pure function over a parameter pytree:
  params = {"clip": <frozen encoder>, "head": <trainable LVC head>}
Only params["head"] receives gradients; the encoder is frozen by
construction (we simply never differentiate w.r.t. it), replacing the
reference's requires_grad/torch.no_grad bookkeeping.

The enriched text bank (TSE) is a precomputed input, not model state —
build it once with `build_text_bank` and pass it to every forward.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import ExcelConfig
from ..ops.surgery import clip_feature_surgery
from ..ops.tse import attr_aggregate
from .clip import encode_image, encode_text_ensemble
from .head import (decoder_forward, feature_affinity, init_head_params,
                   segformer_fuse)


@dataclasses.dataclass(frozen=True)
class ExcelOutputs:
    segs: jax.Array         # [B, hw, num_classes] decoder logits (grid res)
    fused: jax.Array        # [B, hw, embed] LVC features (stop-gradient)
    lams: jax.Array         # [B, hw, num_fg] raw LAMs (patch tokens)
    attn_weights: jax.Array  # [L, B, N, N] encoder per-block attention
    attn_pred: jax.Array    # [B, hw, hw] sigmoid feature affinity
    seg_attn: jax.Array     # [layers, B, hw, hw] decoder attention


def compute_lams(image_out: dict, text_attr: jax.Array,
                 num_fg: int) -> jax.Array:
    """Feature surgery -> fg LAM slice (model_excel.py:58: drop CLS row and
    background-class columns)."""
    maps = clip_feature_surgery(image_out["projected"], text_attr)
    return maps[:, 1:, :num_fg]


def excel_forward(params: dict, images: jax.Array, text_attr: jax.Array,
                  cfg: ExcelConfig, *, ex_feats: jax.Array | None = None,
                  dropout_rng: jax.Array | None = None,
                  attn_mode: str = "stack"):
    """Full forward (model_excel.py:48-78).

    images: [B, H, W, 3] normalized NHWC.
    ex_feats: optional [B, hw, embed] LVC features; when given, runs the
    LAM-only calibrated path (model_excel.py:50-53) and returns just lams.
    attn_mode: encoder attention output shape — "stack" [L,B,N,N] (needed
    whenever SVC runs with seg_attn), "mean" [B,N,N], or "none" (seg-only
    consumers); see models/clip.vision_forward.
    """
    grid = images.shape[1] // cfg.clip.patch_size

    if ex_feats is not None:
        # encoder's calibration branch wants [B, C, h, w]; only the LAMs are
        # consumed (model_excel.py:50-53 discards the rest) — attention
        # outputs are skipped entirely (attn_mode="none")
        b, n, c = ex_feats.shape
        ex_nchw = ex_feats.transpose(0, 2, 1).reshape(b, c, grid, grid)
        out = encode_image(params["clip"], images, cfg.clip, ex_feats=ex_nchw,
                           attn_mode="none")
        return compute_lams(out, text_attr, cfg.num_fg)

    out = encode_image(params["clip"], images, cfg.clip,
                       attn_mode=attn_mode)
    lams = compute_lams(out, text_attr, cfg.num_fg)

    patch_feats = out["feats"][:, :, 1:, :]          # [L, B, hw, width]
    fused = segformer_fuse(params["head"], patch_feats, cfg.head,
                           dropout_rng=dropout_rng,
                           dropout_rate=cfg.head.dropout)
    segs, seg_attn = decoder_forward(params["head"], fused, cfg.head)
    attn_pred = feature_affinity(fused)

    return ExcelOutputs(
        segs=segs,
        fused=jax.lax.stop_gradient(fused),
        lams=lams,
        attn_weights=out["attn"],
        attn_pred=attn_pred,
        seg_attn=seg_attn,
    )


def init_excel_params(key: jax.Array, cfg: ExcelConfig,
                      clip_params: dict) -> dict:
    head = init_head_params(key, cfg.head, cfg.num_classes)
    return {"clip": clip_params, "head": head}


# ---------------------------------------------------------------------------
# text bank (prompt ensemble + TSE), built once per dataset
# ---------------------------------------------------------------------------

def build_text_bank(clip_params: dict, cfg: ExcelConfig,
                    vocabulary: list[str],
                    cluster_bank: jax.Array) -> jax.Array:
    """Enriched text embeddings [num_fg + num_bg, embed]
    (model_excel.py:33-35: prompt-ensemble with the single template
    'a clean origami {}.', then attr_aggregate). `vocabulary` is
    text.class_names.prompt_vocabulary(dataset): fg names then bg names."""
    from ..text.tokenizer import tokenize

    prompts = [cfg.prompt_template.format(n) for n in vocabulary]
    tokens = tokenize(prompts)[:, None, :]           # [T, 1, 77]
    emb = encode_text_ensemble(clip_params, jnp.asarray(tokens), cfg.clip)
    return attr_aggregate(emb, cluster_bank, cfg.num_fg)


# ---------------------------------------------------------------------------
# torch head-checkpoint conversion (for loading published reference ckpts)
# ---------------------------------------------------------------------------

def convert_torch_head(sd: dict, cfg: ExcelConfig) -> dict:
    """Reference ExCEL_model state dict (module.-stripped, numpy values) ->
    head param pytree. Conv2d 1x1 kernels [out,in,1,1] become channel mats."""
    import numpy as np

    def lin(prefix):
        return {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def conv1x1(prefix):
        w = np.asarray(sd[prefix + ".weight"])[:, :, 0, 0]
        return {"w": jnp.asarray(w.T), "b": jnp.asarray(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    fuse_mlps = [
        {"proj": lin(f"decoder_fts_fuse.linears_modulelist.{i}.proj"),
         "proj2": lin(f"decoder_fts_fuse.linears_modulelist.{i}.proj_2")}
        for i in range(cfg.head.num_blocks)
    ]
    blocks = []
    for i in range(cfg.head.decoder_layers):
        p = f"decoder.transformer.resblocks.{i}"
        blocks.append({
            "ln_1": ln(p + ".ln_1"),
            "attn": {
                "qkv": {"w": jnp.asarray(
                            np.asarray(sd[p + ".attn.in_proj_weight"]).T),
                        "b": jnp.asarray(sd[p + ".attn.in_proj_bias"])},
                "out": lin(p + ".attn.out_proj"),
            },
            "ln_2": ln(p + ".ln_2"),
            "mlp": {"fc": lin(p + ".mlp.c_fc"),
                    "proj": lin(p + ".mlp.c_proj")},
        })
    return {"fuse_mlps": fuse_mlps,
            "linear_fuse": conv1x1("decoder_fts_fuse.linear_fuse"),
            "decoder": blocks,
            "classifier": conv1x1("decoder.linear_pred")}
