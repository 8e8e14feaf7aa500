"""MSC+flip segmentation protocol golden test: the reference's _validate
loop (tools/infer_seg_voc.py:47-101 — per-scale flip averaging with the
scale-1.0 keep-first quirk, mean over scales, argmax at label resolution)
composed from the reference's own modules (surgery visual + SegFormerHead +
DecoderTransformer) vs our msc_accumulate sweep on converted params."""
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from excel_tpu.config import ClipConfig, ExcelConfig, HeadConfig
from excel_tpu.engine.evaluate import canvas_argmax, msc_accumulate
from excel_tpu.models.excel import convert_torch_head
from excel_tpu.models.params import convert_torch_state_dict

from ref_oracle import REF, load_ref_module

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted")

LABEL_HW = (50, 60)
NUM_CLASSES = 6
SCALES = (1.0, 0.75, 1.25)


def _stub_mmcv():
    if "mmcv" in sys.modules:
        return
    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    cnn.ConvModule = type("ConvModule", (), {})
    mmcv.cnn = cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = cnn


@pytest.mark.slow
def test_msc_flip_protocol_matches_reference():
    torch = pytest.importorskip("torch")
    _stub_mmcv()
    surgery = load_ref_module("clip/clip_surgery_model.py", "_m_surgery")
    seg_head = load_ref_module("model/segformer_head.py", "_m_seghead")
    dec = load_ref_module("model/decoder/TransDecoder.py", "_m_dec")
    F = torch.nn.functional

    torch.manual_seed(21)
    vis = surgery.ExCEL_CLIP(
        embed_dim=64, image_resolution=64, vision_layers=8, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=1000,
        transformer_width=64, transformer_heads=2, transformer_layers=3,
    ).float().eval()
    clip_sd = {k: v.detach().numpy().copy()
               for k, v in vis.state_dict().items()}
    vis.visual.reload_self_attn(layers=6, feat_size=4, mode="infer")

    fuse = seg_head.SegFormerHead(in_channels=64, embedding_dim=64,
                                  num_classes=NUM_CLASSES, index=8).eval()
    decoder = dec.DecoderTransformer(width=64, layers=2, heads=8,
                                     output_dim=NUM_CLASSES).eval()
    head_sd = {}
    for k, v in fuse.state_dict().items():
        head_sd["decoder_fts_fuse." + k] = v.numpy()
    for k, v in decoder.state_dict().items():
        head_sd["decoder." + k] = v.numpy()

    def ref_segs(x):
        """model(x)[0] of ExCEL_model (model_excel.py:48-69) composed from
        the oracle modules: per-block token maps -> fuse -> decoder."""
        with torch.no_grad():
            _, _, feats_t = vis.visual(x, return_weights=True)
            b = x.shape[0]
            side = int(round((feats_t[0].shape[1] - 1) ** 0.5))
            maps = [f[:, 1:, :].permute(0, 2, 1).reshape(b, -1, side, side)
                    for f in feats_t]
            fused = fuse(torch.stack(maps, dim=0))
            segs, _ = decoder(fused)
            return segs

    rng = np.random.default_rng(17)
    image_u8 = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    image_u8[5:30, 30:60] = (220, 40, 120)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    img_norm = (image_u8.astype(np.float32) - mean) / std

    # ---------------- reference MSC loop (infer_seg_voc.py:60-87) --------
    with torch.no_grad():
        inputs = torch.from_numpy(img_norm.transpose(2, 0, 1))[None]
        h = w = 64
        seg_list = []
        _in = F.interpolate(inputs, size=[64, 64], mode="bilinear",
                            align_corners=False)
        cat = torch.cat([_in, _in.flip(-1)], dim=0)
        segs = ref_segs(cat)
        segs = F.interpolate(segs, size=(h, w), mode="bilinear",
                             align_corners=False)
        seg_list.append(segs[0].unsqueeze(0))          # scale-1.0 quirk
        for sc in SCALES:
            if sc == 1.0:
                continue
            size = int(64 * sc)
            _in = F.interpolate(inputs, size=[size, size], mode="bilinear",
                                align_corners=False)
            cat = torch.cat([_in, _in.flip(-1)], dim=0)
            segs = ref_segs(cat)
            segs = F.interpolate(segs, size=(h, w), mode="bilinear",
                                 align_corners=False)
            seg_list.append((segs[:1] + segs[1:].flip(-1)) / 2)
        fused_segs = torch.mean(torch.stack(seg_list, dim=0), dim=0)
        resized = F.interpolate(fused_segs, size=LABEL_HW, mode="bilinear",
                                align_corners=False)
        ref_pred = torch.argmax(resized, dim=1).numpy()[0]

    # ---------------- ours: msc_accumulate sweep -------------------------
    import dataclasses

    cfg = ExcelConfig(
        clip=ClipConfig(image_size=64, patch_size=16, vision_width=64,
                        vision_layers=8, vision_heads=1, embed_dim=64,
                        pretrain_grid=4, surgery_blocks=5,
                        context_length=77, vocab_size=1000, text_width=64,
                        text_heads=2, text_layers=3),
        head=HeadConfig(embedding_dim=64, in_channels=64, num_blocks=8,
                        decoder_layers=2, decoder_heads=8),
        num_classes=NUM_CLASSES,
    )
    params = {"clip": convert_torch_state_dict(clip_sd, cfg.clip),
              "head": convert_torch_head(head_sd, cfg)}
    text = jnp.asarray(rng.normal(size=(NUM_CLASSES - 1 + 2, 64))
                       .astype(np.float32))
    valid = jnp.asarray([LABEL_HW], jnp.int32)
    canvas = (64, 64)

    from excel_tpu.data.resize import resize_bilinear
    acc = jnp.zeros((1, NUM_CLASSES, *canvas), jnp.float32)
    for sc in SCALES:
        size = int(64 * sc)
        img_s = resize_bilinear(image_u8, (size, size))[None]
        c2 = dataclasses.replace(
            cfg, clip=dataclasses.replace(cfg.clip, image_size=size))
        acc = msc_accumulate(params, jnp.asarray(img_s), valid, text, c2,
                             canvas, acc, keep_flip=(sc != 1.0))
    ours = np.asarray(canvas_argmax(acc))[0, :LABEL_HW[0], :LABEL_HW[1]]

    agreement = (ref_pred == ours).mean()
    assert agreement == 1.0, f"agreement {agreement}"


@pytest.mark.slow
def test_validation_protocol_matches_reference():
    """In-training validation protocol (engine/validatation_engine.py:18-36):
    full model forward at 320-equivalent, pseudo branch with caa 0.75 +
    seg_attn=attn_pred + NORMALIZED guidance at label res, seg branch
    upsampled to label res — both vs our val_step on converted params."""
    torch = pytest.importorskip("torch")
    _stub_mmcv()
    surgery = load_ref_module("clip/clip_surgery_model.py", "_v_surgery")
    seg_head = load_ref_module("model/segformer_head.py", "_v_seghead")
    dec = load_ref_module("model/decoder/TransDecoder.py", "_v_dec")
    affutils = load_ref_module("utils/affutils.py", "_v_affutils")
    parmod = load_ref_module("utils/PAR.py", "_v_par")
    clip_ref = load_ref_module("clip/clip.py", "_v_clip")
    F = torch.nn.functional

    torch.manual_seed(33)
    vis = surgery.ExCEL_CLIP(
        embed_dim=64, image_resolution=64, vision_layers=8, vision_width=64,
        vision_patch_size=16, context_length=77, vocab_size=1000,
        transformer_width=64, transformer_heads=2, transformer_layers=3,
    ).float().eval()
    clip_sd = {k: v.detach().numpy().copy()
               for k, v in vis.state_dict().items()}
    vis.visual.reload_self_attn(layers=6, feat_size=4, mode="infer")
    fuse = seg_head.SegFormerHead(in_channels=64, embedding_dim=64,
                                  num_classes=NUM_CLASSES, index=8).eval()
    decoder = dec.DecoderTransformer(width=64, layers=2, heads=8,
                                     output_dim=NUM_CLASSES).eval()
    par = parmod.PAR(num_iter=20, dilations=[1, 2, 4, 8, 12, 24]).eval()
    head_sd = {}
    for k, v in fuse.state_dict().items():
        head_sd["decoder_fts_fuse." + k] = v.numpy()
    for k, v in decoder.state_dict().items():
        head_sd["decoder." + k] = v.numpy()

    rng = np.random.default_rng(29)
    image_u8 = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    image_u8[30:60, 10:40] = (90, 200, 200)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    img_norm = (image_u8.astype(np.float32) - mean) / std
    text = rng.normal(size=(NUM_CLASSES - 1 + 2, 64)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    cls_label = np.zeros(NUM_CLASSES - 1, np.float32)
    cls_label[[2, 4]] = 1.0

    with torch.no_grad():
        inputs = torch.from_numpy(img_norm.transpose(2, 0, 1))[None]
        # ExCEL_model.forward composed from oracle pieces
        x_t, attn_t, feats_t = vis.visual(inputs, return_weights=True)
        fts = x_t / x_t.norm(dim=1, keepdim=True)
        maps = clip_ref.clip_feature_surgery(fts, torch.from_numpy(text))
        lams_t = maps[:, 1:, :NUM_CLASSES - 1]
        attn_w = torch.stack(attn_t)
        grids = [f[:, 1:, :].permute(0, 2, 1).reshape(1, -1, 4, 4)
                 for f in feats_t]
        fused = fuse(torch.stack(grids, dim=0))
        segs, _ = decoder(fused)
        # attn_pred (model_excel.py:70-76)
        fdiver = fused.reshape(1, 64, -1).permute(0, 2, 1)
        fn_ = fdiver / fdiver.norm(dim=-1, keepdim=True)
        g = torch.einsum("bnc,bmc->bnm", fn_, fn_)
        attn_pred = torch.sigmoid((g - g.mean()) * 3.0)
        # pseudo branch (validatation_engine.py:28-35): caa 0.75, NORMALIZED
        refined, cls_lst = affutils.refine_cams_with_aff(
            lams_t[0], attn_w[:, 0], torch.from_numpy(cls_label),
            size=(64, 64), seg_attn=attn_pred[0].unsqueeze(0),
            caa_thre=0.75)
        ref_pseudo, _ = affutils.refine_cams_with_bkg_weclip(
            refined, inputs[0], cls_lst, par, size=LABEL_HW)
        # seg branch
        resized = F.interpolate(segs, size=LABEL_HW, mode="bilinear",
                                align_corners=False)
        ref_seg = torch.argmax(resized, dim=1).numpy()[0]
    ref_pseudo = ref_pseudo.numpy()[0]

    from excel_tpu.engine.evaluate import val_step
    cfg = ExcelConfig(
        clip=ClipConfig(image_size=64, patch_size=16, vision_width=64,
                        vision_layers=8, vision_heads=1, embed_dim=64,
                        pretrain_grid=4, surgery_blocks=5,
                        context_length=77, vocab_size=1000, text_width=64,
                        text_heads=2, text_layers=3),
        head=HeadConfig(embedding_dim=64, in_channels=64, num_blocks=8,
                        decoder_layers=2, decoder_heads=8, dropout=0.0),
        num_classes=NUM_CLASSES,
    )
    params = {"clip": convert_torch_state_dict(clip_sd, cfg.clip),
              "head": convert_torch_head(head_sd, cfg)}
    pseudos, segs_o = val_step(
        params, jnp.asarray(image_u8.astype(np.float32))[None],
        jnp.asarray(cls_label)[None], jnp.asarray([LABEL_HW], jnp.int32),
        jnp.asarray(text), cfg, (64, 64))
    ours_p = np.asarray(pseudos)[0, :LABEL_HW[0], :LABEL_HW[1]]
    ours_s = np.asarray(segs_o)[0, :LABEL_HW[0], :LABEL_HW[1]]

    assert (ref_pseudo == ours_p).mean() == 1.0, (ref_pseudo != ours_p).mean()
    assert (ref_seg == ours_s).mean() == 1.0, (ref_seg != ours_s).mean()
