"""END-TO-END golden parity: the full training-free pipeline (encoder ->
feature surgery -> SVC -> background -> PAR -> argmax at label resolution)
composed from the REFERENCE's own torch/cv2 code vs our single jitted
lam_eval_step, on identical random weights and input.

This is the strongest parity statement available without real CLIP weights:
if every pixel matches here, published-mIoU parity transfers with the
weights (PARITY.md)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from excel_tpu.config import ClipConfig, ExcelConfig, RefineConfig
from excel_tpu.engine.evaluate import lam_eval_step
from excel_tpu.models.params import convert_torch_state_dict

from ref_oracle import REF, load_ref_module

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted")

LABEL_HW = (50, 60)          # non-square: exercises the valid-extent canvas
NUM_FG = 5
NUM_BG = 2


@pytest.fixture(scope="module")
def oracle():
    torch = pytest.importorskip("torch")
    surgery = load_ref_module("clip/clip_surgery_model.py", "_g_surgery")
    affutils = load_ref_module("utils/affutils.py", "_g_affutils")
    parmod = load_ref_module("utils/PAR.py", "_g_par")

    torch.manual_seed(7)
    model = surgery.ExCEL_CLIP(
        embed_dim=64, image_resolution=64, vision_layers=8, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=1000,
        transformer_width=64, transformer_heads=2, transformer_layers=3,
    ).float().eval()
    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    model.visual.reload_self_attn(layers=6, feat_size=4, mode="infer")
    par = parmod.PAR(num_iter=20, dilations=[1, 2, 4, 8, 12, 24]).eval()
    return torch, model, affutils, par, sd


def test_training_free_pipeline_matches_reference(oracle):
    torch, model, affutils, par, sd = oracle
    rng = np.random.default_rng(3)

    # shared inputs: uint8 image, class labels, normalized text bank
    image_u8 = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    image_u8[10:40, 5:35] = (200, 60, 40)        # a blob for structure
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    img_norm = (image_u8.astype(np.float32) - mean) / std
    text = rng.normal(size=(NUM_FG + NUM_BG, 64)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    cls_label = np.zeros(NUM_FG, np.float32)
    cls_label[[1, 3]] = 1.0

    # ---------------- reference pipeline (torch/cv2, in place) ----------
    with torch.no_grad():
        t_img = torch.from_numpy(img_norm.transpose(2, 0, 1))[None]
        x_t, attn_t, _ = model.visual(t_img, return_weights=True)
        fts = x_t / x_t.norm(dim=1, keepdim=True)   # token-dim norm quirk
        clip_ref = load_ref_module("clip/clip.py", "_g_clip")
        maps = clip_ref.clip_feature_surgery(fts, torch.from_numpy(text))
        attr_map = maps[0, 1:, :NUM_FG]                       # [hw, fg]
        attn_weight = torch.stack(attn_t)[:, 0]               # [L, N, N]
        refined, cls_lst = affutils.refine_cams_with_aff(
            attr_map, attn_weight, torch.from_numpy(cls_label),
            size=(64, 64), seg_attn=None, caa_thre=0.79)
        ref_labels, _ = affutils.refine_cams_with_bkg_weclip(
            refined, t_img[0], cls_lst, par, size=LABEL_HW)
    ref_labels = ref_labels.numpy()[0]

    # ---------------- ours: one jitted step -----------------------------
    cfg = ExcelConfig(
        clip=ClipConfig(image_size=64, patch_size=16, vision_width=64,
                        vision_layers=8, vision_heads=1, embed_dim=64,
                        pretrain_grid=4, surgery_blocks=5,
                        context_length=77, vocab_size=1000, text_width=64,
                        text_heads=2, text_layers=3),
        refine=RefineConfig(),           # caa 0.79, PAR 20x(1,2,4,8,12,24)
        num_classes=NUM_FG + 1,
    )
    params = {"clip": convert_torch_state_dict(sd, cfg.clip)}
    labels = lam_eval_step(
        params, jnp.asarray(image_u8.astype(np.float32))[None],
        jnp.asarray(cls_label)[None],
        jnp.asarray([LABEL_HW], jnp.int32),
        jnp.asarray(text), cfg, (64, 64), "training_free")
    ours = np.asarray(labels)[0, :LABEL_HW[0], :LABEL_HW[1]]

    assert ref_labels.shape == ours.shape, (ref_labels.shape, ours.shape)
    agreement = (ref_labels == ours).mean()
    assert agreement == 1.0, (
        f"agreement {agreement}: "
        f"ref classes {np.unique(ref_labels)}, ours {np.unique(ours)}")


@pytest.mark.slow
def test_trained_flip_fused_pipeline_matches_reference(oracle):
    """Trained-mode LAM eval: flip-fused LVC-calibrated LAMs + seg_attn SVC
    (tools/infer_lam.py:80-93 + utils/camutils.py cure_attr_map_flip),
    with a parameter-free stand-in for the LVC head (mean of per-block
    patch features) mirrored exactly on both sides."""
    torch, model, affutils, par, sd = oracle
    camutils = load_ref_module("utils/camutils.py", "_g_camutils")
    clip_ref = load_ref_module("clip/clip.py", "_g_clip")
    rng = np.random.default_rng(11)

    image_u8 = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    image_u8[20:50, 25:60] = (40, 180, 60)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    img_norm = (image_u8.astype(np.float32) - mean) / std
    text = rng.normal(size=(NUM_FG + NUM_BG, 64)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    cls_label = np.zeros(NUM_FG, np.float32)
    cls_label[[0, 2]] = 1.0

    class ShimModel:
        """Mimics ExCEL_model's forward contract for cure_attr_map_flip:
        fused LVC features := mean over blocks of the patch tokens."""

        def __call__(self, inputs, ex_feats=None):
            b = inputs.shape[0]
            if ex_feats is not None:
                ex = ex_feats.permute(0, 2, 1).reshape(b, -1, 4, 4)
                x_t, attn_t, _ = model.visual(inputs, return_weights=True,
                                              ex_feats=ex)
            else:
                x_t, attn_t, feats_t = model.visual(inputs,
                                                    return_weights=True)
            fts = x_t / x_t.norm(dim=1, keepdim=True)
            maps = clip_ref.clip_feature_surgery(fts,
                                                 torch.from_numpy(text))
            lams = maps[:, 1:, :NUM_FG]
            if ex_feats is not None:
                return lams
            fused = torch.stack(feats_t).mean(0)[:, 1:, :]   # [B, hw, C]
            attn_w = torch.stack(attn_t, dim=0)
            f = fused / fused.norm(dim=-1, keepdim=True)
            g = torch.einsum("bnc,bmc->bnm", f, f)
            attn_pred = torch.sigmoid((g - g.mean()) * 3.0)
            return None, fused, lams, attn_w, attn_pred

    shim = ShimModel()
    with torch.no_grad():
        t_img = torch.from_numpy(img_norm.transpose(2, 0, 1))[None]
        _, fused, _, attn_w, attn_pred = shim(t_img)
        lams = camutils.cure_attr_map_flip(shim, t_img)      # flip-fused
        refined, cls_lst = affutils.refine_cams_with_aff(
            lams[0], attn_w[:, 0], torch.from_numpy(cls_label),
            size=(64, 64), seg_attn=attn_pred[0].unsqueeze(0),
            caa_thre=0.79)
        ref_labels, _ = affutils.refine_cams_with_bkg_weclip(
            refined, t_img[0], cls_lst, par, size=LABEL_HW)
    ref_labels = ref_labels.numpy()[0]

    # ---- ours: mirror the shim's fused-feature definition ---------------
    import excel_tpu.engine.evaluate as ev
    from excel_tpu.models import excel as excel_mod

    cfg = ExcelConfig(
        clip=ClipConfig(image_size=64, patch_size=16, vision_width=64,
                        vision_layers=8, vision_heads=1, embed_dim=64,
                        pretrain_grid=4, surgery_blocks=5,
                        context_length=77, vocab_size=1000, text_width=64,
                        text_heads=2, text_layers=3),
        refine=RefineConfig(),
        num_classes=NUM_FG + 1,
    )
    params = {"clip": convert_torch_state_dict(sd, cfg.clip)}

    from excel_tpu.models.clip import encode_image
    from excel_tpu.models.excel import compute_lams
    from excel_tpu.models.head import feature_affinity

    def flip_fused(images):
        b = images.shape[0]
        grid = 4
        cat = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
        out = encode_image(params["clip"], cat, cfg.clip)
        fused = out["feats"].mean(0)[:, 1:, :]
        ex = fused.transpose(0, 2, 1).reshape(2 * b, -1, grid, grid)
        out2 = encode_image(params["clip"], cat, cfg.clip, ex_feats=ex)
        lams2 = compute_lams(out2, jnp.asarray(text), NUM_FG)
        maps = lams2.transpose(0, 2, 1).reshape(2 * b, -1, grid, grid)
        fmax = jnp.maximum(maps[:b], maps[b:, :, :, ::-1])
        fmax = fmax - fmax.min(axis=(-2, -1), keepdims=True)
        fmax = fmax / (fmax.max(axis=(-2, -1), keepdims=True) + 1e-5)
        lams_f = fmax.reshape(b, -1, grid * grid).transpose(0, 2, 1)
        return lams_f, out["attn"][:, :b], feature_affinity(fused[:b])

    from excel_tpu.engine.pipeline import normalize_images
    images = jnp.asarray(image_u8.astype(np.float32))[None]
    nimg = normalize_images(images)
    lams_f, attn_wj, seg_attn = flip_fused(nimg)
    labels, _ = ev._pseudo_on_canvas(
        lams_f, attn_wj, nimg.transpose(0, 3, 1, 2),
        jnp.asarray(cls_label)[None], jnp.asarray([LABEL_HW], jnp.int32),
        cfg, (64, 64), cfg.refine.caa_threshold, seg_attn)
    ours = np.asarray(labels)[0, :LABEL_HW[0], :LABEL_HW[1]]

    agreement = (ref_labels == ours).mean()
    assert agreement == 1.0, (
        f"agreement {agreement}: ref {np.unique(ref_labels)}, "
        f"ours {np.unique(ours)}")


def test_training_pseudo_labels_match_reference(oracle):
    """The train-loop pseudo-label configuration (train_voc.py:180-199):
    DENORMALIZED PAR guidance at crop resolution, caa 0.79, no seg_attn."""
    torch, model, affutils, par, sd = oracle
    clip_ref = load_ref_module("clip/clip.py", "_g_clip")
    imutils = load_ref_module("utils/imutils.py", "_g_imutils")
    rng = np.random.default_rng(5)

    image_u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    image_u8[:, 8:30, 40:60] = (30, 30, 220)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    img_norm = (image_u8.astype(np.float32) - mean) / std
    text = rng.normal(size=(NUM_FG + NUM_BG, 64)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    cls_label = np.zeros((2, NUM_FG), np.float32)
    cls_label[0, [1, 4]] = 1.0
    cls_label[1, [0]] = 1.0

    with torch.no_grad():
        t_img = torch.from_numpy(img_norm.transpose(0, 3, 1, 2))
        inputs_denorm = imutils.denormalize_img2(t_img.clone())
        x_t, attn_t, _ = model.visual(t_img, return_weights=True)
        fts = x_t / x_t.norm(dim=1, keepdim=True)
        maps = clip_ref.clip_feature_surgery(fts, torch.from_numpy(text))
        lams_t = maps[:, 1:, :NUM_FG]
        attn_w = torch.stack(attn_t)
        refs = []
        for i in range(2):
            refined, cls_lst = affutils.refine_cams_with_aff(
                lams_t[i], attn_w[:, i], torch.from_numpy(cls_label[i]),
                size=(64, 64), seg_attn=None, caa_thre=0.79)
            lab, _ = affutils.refine_cams_with_bkg_weclip(
                refined, inputs_denorm[i], cls_lst, par, size=(64, 64))
            refs.append(lab.numpy()[0])
    ref_labels = np.stack(refs)

    cfg = ExcelConfig(
        clip=ClipConfig(image_size=64, patch_size=16, vision_width=64,
                        vision_layers=8, vision_heads=1, embed_dim=64,
                        pretrain_grid=4, surgery_blocks=5,
                        context_length=77, vocab_size=1000, text_width=64,
                        text_heads=2, text_layers=3),
        refine=RefineConfig(),
        num_classes=NUM_FG + 1,
    )
    params = {"clip": convert_torch_state_dict(sd, cfg.clip)}

    from excel_tpu.engine.pipeline import (denormalize_images, lam_forward,
                                           normalize_images, pseudo_labels)
    images = normalize_images(jnp.asarray(image_u8.astype(np.float32)))
    lams, attn = lam_forward(params["clip"], images, jnp.asarray(text), cfg)
    par_imgs = denormalize_images(images).transpose(0, 3, 1, 2)
    ours = np.asarray(pseudo_labels(
        lams, attn, par_imgs, jnp.asarray(cls_label), cfg, (64, 64),
        cfg.refine.caa_threshold))

    agreement = (ref_labels == ours).mean()
    assert agreement == 1.0, f"agreement {agreement}"
