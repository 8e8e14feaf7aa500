"""Frozen CLIP ViT-B/16 with ExCEL architecture surgery — functional JAX.

Design stance (SURVEY.md §7): the frozen encoder is *parameters*, not a
module-with-state. "Surgery" is a static config of the forward function —
which trailing blocks run the dual-path value-value attention — rather than
runtime mutation of loaded modules (reference: clip_surgery_model.py:395-416
rewires nn.Modules in place; we simply branch per block index at trace time).

Parity targets (reference file:line):
- VisionTransformer.forward           clip_surgery_model.py:419-448
- ResidualAttentionBlock dual path    clip_surgery_model.py:285-337
- Transformer no-grad loop            clip_surgery_model.py:339-371
- positional-embedding interpolation  clip_surgery_model.py:408-414,426-437
- ExCEL_CLIP.encode_text              clip_surgery_model.py:551-564
- generate_clip_fts token-dim norm    clip/clip.py:348-358
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ClipConfig
from .layers import (attention, attention_fused, external_feature_attention,
                     layer_norm, mlp, surgery_attention,
                     surgery_attention_fused)


# ---------------------------------------------------------------------------
# positional embedding
# ---------------------------------------------------------------------------

def interpolate_pos_embedding(pos: jax.Array, new_side: int) -> jax.Array:
    """Bilinearly resize the grid part of a [1+S*S, C] positional table.

    Matches torch F.interpolate(mode='bilinear', align_corners=False) used at
    clip_surgery_model.py:408-414 (jax.image.resize 'linear' uses the same
    half-pixel sampling).
    """
    cls_tok, grid = pos[:1], pos[1:]
    side = int(round(float(grid.shape[0]) ** 0.5))
    c = grid.shape[-1]
    if side == new_side:
        return pos
    grid = grid.reshape(side, side, c)
    grid = jax.image.resize(grid, (new_side, new_side, c), method="linear")
    return jnp.concatenate([cls_tok, grid.reshape(new_side * new_side, c)], axis=0)


# ---------------------------------------------------------------------------
# vision encoder (surgery)
# ---------------------------------------------------------------------------

def vision_forward(params: dict, images: jax.Array, cfg: ClipConfig,
                   ex_feats: jax.Array | None = None,
                   attn_mode: str = "stack"):
    """Surgery ViT forward.

    images: [B, H, W, 3] (NHWC, already normalized).
    ex_feats: optional [B, C, h, w] LVC features for attention calibration.
    attn_mode (static):
      "stack" — attn = [L, B, N, N] per-block weights (head-mean for single
                path blocks, head-sum for surgery blocks); L =
                cfg.attn_out_layers (or all). SVC's seg_attn path needs the
                per-block stack (ops/affinity.aggregate_attn keep-mask).
      "mean"  — attn = [B, N, N] fp32, the mean over those L blocks. The
                training-free / no-seg_attn SVC path only ever consumes
                this mean (affutils.py:180 `sum/len`), so the fused kernels
                accumulate it across blocks in place and the per-block
                stacks never reach HBM.
      "none"  — attn = None (seg-only / calibrated-second-pass forwards:
                the reference computes weights it then discards).

    Returns dict with:
      projected  [B, N, embed_dim]  — CLS from original path, patches dense
      attn       see attn_mode
      feats      [12, B, N, width]  — per-block original-path token features
    """
    assert attn_mode in ("stack", "mean", "none"), attn_mode
    # the mean covers exactly the cfg.attn_out_layers window; callers must
    # only request it when that equals the SVC consumption length
    # (engine.pipeline.attn_mode_for handles the fallback to "stack")
    assert attn_mode != "mean" or cfg.attn_out_layers is not None, \
        "attn_mode='mean' needs an explicit attn_out_layers window"
    p = params["visual"]
    heads = cfg.vision_heads
    n_single = cfg.vision_layers - cfg.surgery_blocks

    x = jax.lax.conv_general_dilated(
        images.astype(cfg.compute_dtype),
        p["patch_embed"].astype(cfg.compute_dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype), (b, 1, c))
    x = jnp.concatenate([cls, x], axis=1)

    pos = interpolate_pos_embedding(p["positional_embedding"], gh)
    x = x + pos.astype(x.dtype)
    x = layer_norm(x, p["ln_pre"])

    ex_attn = None
    if ex_feats is not None:
        ex_attn = external_feature_attention(ex_feats).astype(x.dtype)

    # the fused kernels row-chunk their [N, N] fp32 intermediates; beyond
    # 640 tokens the surgery kernel also row-chunks its output GRID
    # (attention_pallas._fused_surgery_attention_rows), so both kernels
    # cover the largest MSC scale (901 tokens) — fall back to jnp above
    n_tokens = gh * gw + 1
    fused_on = cfg.fused_attention and (
        cfg.fused_attention == "interpret"
        or jax.default_backend() == "tpu")
    # one flag for both block kinds: the "mean" accumulator handoff below
    # assumes single-path and surgery blocks take the same (fused vs jnp)
    # branch, so routing them separately would silently drop prior
    # in-window blocks from the mean
    use_fused = fused_on and n_tokens <= 1100
    interp = cfg.fused_attention == "interpret"

    # which trailing blocks' attention the output covers
    window = cfg.attn_out_layers or cfg.vision_layers
    win_start = cfg.vision_layers - window

    attn_list = []          # "stack"/"mean" jnp path: per-window-block mats
    attn_acc = None         # "mean" fused path: in-kernel accumulator
    single_feats, ori_feats, ori_residuals = [], [], []
    x_ori = None
    for i, blk in enumerate(p["blocks"]):
        in_win = i >= win_start and attn_mode != "none"
        fused_acc = None
        if attn_mode == "mean" and in_win and attn_acc is not None:
            fused_acc = attn_acc
        if i < n_single:
            if use_fused:
                y, attn_w = attention_fused(layer_norm(x, blk["ln_1"]),
                                            blk["attn"], heads,
                                            interpret=interp,
                                            attn_acc=fused_acc,
                                            need_weights=in_win)
            else:
                y, attn_w = attention(layer_norm(x, blk["ln_1"]),
                                      blk["attn"], heads)
            x = x + y
            x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"])
            single_feats.append(x)
        else:
            # dual path: both streams attend over ln_1 of the ORIGINAL stream
            src = x if x_ori is None else x_ori
            if use_fused:
                dense_res, ori_res, attn_w = surgery_attention_fused(
                    layer_norm(src, blk["ln_1"]), blk["attn"], heads,
                    ex_attn, interpret=interp, attn_acc=fused_acc,
                    need_attn=in_win)
            else:
                dense_res, ori_res, attn_w = surgery_attention(
                    layer_norm(src, blk["ln_1"]), blk["attn"], heads, ex_attn)
            x_ori = src + ori_res
            x_ori = x_ori + mlp(layer_norm(x_ori, blk["ln_2"]), blk["mlp"])
            x = x + dense_res          # dense stream skips the FFN
            ori_feats.append(x_ori)
            ori_residuals.append(ori_res)
        if in_win:
            if attn_mode == "mean" and use_fused:
                attn_acc = attn_w          # kernel already added prior acc
            else:
                attn_list.append(attn_w)

    # CLS token comes from the original path (clip_surgery_model.py:442);
    # with surgery_blocks=0 this is a vanilla CLIP ViT (reference
    # clip_model.py's encoder, used offline by attribute clustering)
    if x_ori is not None:
        x = x.at[:, 0, :].set(x_ori[:, 0, :])

    # Per-block feature stack, replicating the reference's EFFECTIVE values.
    # The reference appends torch *views* (clip_surgery_model.py:355-361) that
    # are mutated later by the in-place `x += x_res` (:319,:329) and
    # `x_ori += x_ori_res` (:317) updates and the CLS write (:442). Net
    # effect fed to the LVC head:
    #   - blocks 0..n_single-2: clean single-path outputs
    #   - block  n_single-1:    the FINAL dense stream (CLS already swapped)
    #   - surgery blocks i<last: x_ori after block i + block i+1's attention
    #                            residual (pre-MLP)
    #   - last surgery block:    clean x_ori
    if ori_feats:
        feat_list = single_feats[:-1] + [x]
        for j in range(len(ori_feats) - 1):
            feat_list.append(ori_feats[j] + ori_residuals[j + 1])
        feat_list.append(ori_feats[-1])
    else:
        feat_list = single_feats

    x = layer_norm(x, p["ln_post"])
    projected = jnp.dot(x, p["proj"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    projected = projected.astype(x.dtype)

    if attn_mode == "none":
        attn_out = None
    elif attn_mode == "mean":
        if attn_acc is not None:
            attn_out = attn_acc / window
        else:
            # jnp path: stack-then-mean keeps bit-parity with the "stack"
            # mode consumed through ops/affinity.aggregate_attn
            attn_out = jnp.stack(attn_list, axis=0).astype(
                jnp.float32).mean(axis=0)
    else:
        attn_out = jnp.stack(attn_list, axis=0)

    return {
        "projected": projected,
        "attn": attn_out,
        "feats": jnp.stack(feat_list, axis=0),
    }


def encode_image(params: dict, images: jax.Array, cfg: ClipConfig,
                 ex_feats: jax.Array | None = None,
                 attn_mode: str = "stack"):
    """generate_clip_fts equivalent (clip/clip.py:348-358).

    NOTE the reference normalizes over the TOKEN dimension (dim=1 of [B,N,C]),
    not the feature dimension — an effective-behavior quirk we replicate.
    """
    out = vision_forward(params, images, cfg, ex_feats, attn_mode=attn_mode)
    feats = out["projected"]
    out["projected"] = feats / jnp.linalg.norm(feats, axis=1, keepdims=True)
    return out


# ---------------------------------------------------------------------------
# text encoder
# ---------------------------------------------------------------------------

def text_forward(params: dict, tokens: jax.Array, cfg: ClipConfig) -> jax.Array:
    """CLIP text transformer; pools at the EOT (argmax-id) position."""
    p = params["text"]
    x = p["token_embedding"][tokens].astype(cfg.compute_dtype)
    x = x + p["positional_embedding"].astype(x.dtype)

    n = tokens.shape[-1]
    causal = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)

    for blk in p["blocks"]:
        y, _ = attention(layer_norm(x, blk["ln_1"]), blk["attn"],
                         cfg.text_heads, mask=causal)
        x = x + y
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"])

    x = layer_norm(x, p["ln_final"])
    eot = tokens.argmax(axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    out = jnp.dot(pooled, p["text_projection"],
                  preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def encode_text_ensemble(params: dict, token_batches: jax.Array,
                         cfg: ClipConfig) -> jax.Array:
    """Prompt-ensemble class embeddings (clip/clip.py:252-269).

    token_batches: [num_classes, num_templates, 77]. Per class: encode all
    templates, L2-normalize each, mean, L2-normalize the mean.
    """
    nc, nt, L = token_batches.shape
    flat = token_batches.reshape(nc * nt, L)
    emb = text_forward(params, flat, cfg).reshape(nc, nt, -1)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    mean = emb.mean(axis=1)
    return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)
