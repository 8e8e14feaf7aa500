"""End-to-end jittable pipelines: training-free LAM inference and the
pseudo-label generator shared by training and evaluation.

Reference call stacks: SURVEY.md §3.1 (train) and §3.4 (infer_lam). The
reference's per-image Python loop with GPU<->CPU cv2 round-trips becomes one
fixed-shape jitted function over the whole batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ExcelConfig
from ..models.clip import encode_image
from ..models.excel import compute_lams, excel_forward
from ..ops.affinity import refine_lams_batch
from ..ops.labels import argmax_label, cams_with_background
from ..ops.par import par_refine

# ImageNet stats in 0-255 space (reference datasets/transforms.py:7-14)
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def normalize_images(images_u8: jax.Array) -> jax.Array:
    """[..., H, W, 3] uint8/float 0-255 -> normalized float32 NHWC."""
    x = images_u8.astype(jnp.float32)
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def denormalize_images(images: jax.Array) -> jax.Array:
    """Normalized NHWC -> [0,1] float with the reference's uint8 truncation
    (utils/imutils.py:11-24 denormalize_img2): PAR sees this in training."""
    x = images * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
    return jnp.clip(jnp.floor(x), 0, 255) / 255.0


def attn_mode_for(cfg: ExcelConfig) -> str:
    """Encoder attention mode for no-seg_attn SVC paths: "mean" (in-kernel
    block-mean accumulation) whenever the encoder's attention window equals
    the SVC consumption length, else the always-correct "stack"."""
    return ("mean" if cfg.clip.attn_out_layers == cfg.refine.attn_layers
            else "stack")


def lam_forward(clip_params: dict, images: jax.Array, text_attr: jax.Array,
                cfg: ExcelConfig, attn_mode: str | None = None):
    """Training-free forward: frozen encoder only (no LVC head).

    Returns (lams [B, hw, num_fg], attn). The training-free SVC consumes
    only the block-mean attention, so the default picks attn_mode_for(cfg)
    ("mean": [B, N, N] accumulated in-kernel when the windows line up);
    pass "stack" explicitly for the [L, B, N, N] per-block stack.
    """
    if attn_mode is None:
        attn_mode = attn_mode_for(cfg)
    out = encode_image(clip_params, images, cfg.clip, attn_mode=attn_mode)
    return compute_lams(out, text_attr, cfg.num_fg), out["attn"]


def pseudo_labels(lams: jax.Array, attn_weights: jax.Array,
                  par_images: jax.Array, cls_label: jax.Array,
                  cfg: ExcelConfig, out_hw: tuple[int, int],
                  caa_threshold: float,
                  seg_attn: jax.Array | None = None,
                  class_slots: int | None = None) -> jax.Array:
    """LAMs -> SVC refine -> +background -> PAR -> argmax pseudo-labels.

    lams:       [B, hw, num_fg] raw LAM scores
    par_images: [B, 3, H, W] guidance images at out_hw (the reference uses
                denormalized images in training, normalized in LAM eval)
    class_slots: compact to bg + `class_slots` present-class channels before
                refinement (the reference's own cost structure — it only
                refines present classes). EXACT when every image has <=
                class_slots present classes; see ops/labels.class_slot_index.
    Returns [B, H, W] int32 labels.
    """
    b, hw, c = lams.shape
    grid = int(round(hw ** 0.5))
    lams = lams.transpose(0, 2, 1)                        # [B, C, hw]
    if class_slots is not None and class_slots < c:
        from ..ops.labels import class_slot_index, slot_label_to_class
        idx, smask = class_slot_index(cls_label, class_slots)
        lams = jnp.take_along_axis(lams, idx[:, :, None], axis=1)
        cls_sel = smask
    else:
        class_slots = None
        cls_sel = cls_label
    refined = refine_lams_batch(
        lams, attn_weights, caa_threshold, (grid, grid),
        attn_layers=cfg.refine.attn_layers, seg_attn=seg_attn)
    cams = cams_with_background(
        refined.reshape(b, -1, grid, grid), cls_sel, out_hw)
    cams = par_refine(par_images, cams,
                      dilations=tuple(cfg.refine.par_dilations),
                      num_iter=cfg.refine.par_iters,
                      dtype=jnp.bfloat16 if cfg.refine.par_bf16 else None)
    label = argmax_label(cams, cls_sel, ignore_index=cfg.refine.ignore_index)
    if class_slots is not None:
        return slot_label_to_class(label, idx)
    return label


@functools.partial(jax.jit, static_argnames=("cfg", "class_slots"))
def training_free_step(clip_params: dict, images_u8: jax.Array,
                       cls_label: jax.Array, text_attr: jax.Array,
                       cfg: ExcelConfig,
                       class_slots: int | None = None) -> jax.Array:
    """One batched training-free inference step at crop resolution.

    images_u8: [B, H, W, 3] uint8 RGB. Returns pseudo labels [B, H, W].
    Mirrors tools/infer_lam.py:74-94 (training_free branch: no seg_attn,
    normalized images feed PAR, caa 0.79).
    """
    images = normalize_images(images_u8)
    lams, attn = lam_forward(clip_params, images, text_attr, cfg)
    par_imgs = images.transpose(0, 3, 1, 2)          # normalized, NCHW
    return pseudo_labels(lams, attn, par_imgs, cls_label, cfg,
                         images.shape[1:3], cfg.refine.caa_threshold,
                         class_slots=class_slots)


@functools.partial(jax.jit, static_argnames=("cfg", "calibrated",
                                             "class_slots"))
def trained_lam_step(params: dict, images_u8: jax.Array, cls_label: jax.Array,
                     text_attr: jax.Array, cfg: ExcelConfig,
                     calibrated: bool = True,
                     class_slots: int | None = None):
    """Trained-mode LAM inference: full model + LVC-calibrated second pass +
    attn_pred as seg_attn (tools/infer_lam.py:84-93, cure_attr_map path).

    Returns (pseudo labels [B, H, W], seg logits [B, hw, C]).
    """
    images = normalize_images(images_u8)
    out = excel_forward(params, images, text_attr, cfg)
    lams = out.lams
    if calibrated:
        lams = excel_forward(params, images, text_attr, cfg,
                             ex_feats=out.fused)
    par_imgs = images.transpose(0, 3, 1, 2)
    labels = pseudo_labels(lams, out.attn_weights, par_imgs, cls_label, cfg,
                           images.shape[1:3], cfg.refine.caa_threshold,
                           seg_attn=out.attn_pred, class_slots=class_slots)
    return labels, out.segs
