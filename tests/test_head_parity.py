"""Parity of the LVC head (SegFormer fuse + decoder + losses + attn_pred)
against the reference torch modules, loaded in place with random init."""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from excel_tpu.config import ExcelConfig, HeadConfig
from excel_tpu.models.excel import convert_torch_head
from excel_tpu.models.head import (decoder_forward, feature_affinity,
                                   segformer_fuse)
from excel_tpu.models.losses import aff_loss, seg_loss

from ref_oracle import REF, load_ref_module

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted")


def _stub_mmcv():
    if "mmcv" in sys.modules:
        return
    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    cnn.ConvModule = type("ConvModule", (), {})
    mmcv.cnn = cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = cnn


@pytest.fixture(scope="module")
def oracle():
    torch = pytest.importorskip("torch")
    _stub_mmcv()
    seg_head = load_ref_module("model/segformer_head.py", "segformer_head")
    # TransDecoder does `from .myAtt import MultiheadAttention`
    dec = load_ref_module("model/decoder/TransDecoder.py", "TransDecoder")
    losses = load_ref_module("model/losses.py", "losses")

    torch.manual_seed(0)
    cfg = ExcelConfig(head=HeadConfig(embedding_dim=64, in_channels=96,
                                      num_blocks=12, decoder_layers=3,
                                      decoder_heads=8))
    fuse = seg_head.SegFormerHead(in_channels=96, embedding_dim=64,
                                  num_classes=21, index=12).eval()
    decoder = dec.DecoderTransformer(width=64, layers=3, heads=8,
                                     output_dim=21).eval()
    sd = {}
    for k, v in fuse.state_dict().items():
        sd["decoder_fts_fuse." + k] = v.numpy()
    for k, v in decoder.state_dict().items():
        sd["decoder." + k] = v.numpy()
    params = convert_torch_head(sd, cfg)
    return torch, fuse, decoder, losses, cfg, params


def test_segformer_fuse_parity(oracle):
    torch, fuse, _, _, cfg, params = oracle
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(12, 2, 64, 96)).astype(np.float32)  # [L,B,hw,C]
    # reference wants [L, B, C, h, w]
    x_all = torch.from_numpy(
        feats.transpose(0, 1, 3, 2).reshape(12, 2, 96, 8, 8))
    with torch.no_grad():
        ref = fuse(x_all).numpy()                    # [B, 64, 8, 8]
    mine = segformer_fuse(params, jnp.asarray(feats), cfg.head)
    mine = np.asarray(mine).transpose(0, 2, 1).reshape(2, 64, 8, 8)
    np.testing.assert_allclose(mine, ref, atol=2e-5, rtol=1e-4)


def test_decoder_parity(oracle):
    torch, _, decoder, _, cfg, params = oracle
    rng = np.random.default_rng(1)
    fused = rng.normal(size=(2, 64, 64)).astype(np.float32)      # [B,hw,C]
    x = torch.from_numpy(fused.transpose(0, 2, 1).reshape(2, 64, 8, 8))
    with torch.no_grad():
        ref_logit, ref_attns = decoder(x)
    logits, attns = decoder_forward(params, jnp.asarray(fused), cfg.head)
    mine_logit = np.asarray(logits).transpose(0, 2, 1).reshape(2, 21, 8, 8)
    np.testing.assert_allclose(mine_logit, ref_logit.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(attns),
                               torch.stack(ref_attns).numpy(),
                               atol=2e-5, rtol=1e-4)


def test_feature_affinity_parity(oracle):
    torch, *_ = oracle
    rng = np.random.default_rng(2)
    fused = rng.normal(size=(2, 49, 32)).astype(np.float32)
    # reference math (model/model_excel.py:70-76)
    t = torch.from_numpy(fused.transpose(0, 2, 1))               # [B,C,hw]
    tn = torch.nn.functional.normalize(t, dim=1)
    ref = tn.transpose(2, 1).bmm(tn)
    ref = torch.sigmoid((ref - torch.mean(ref)) * 3.0).numpy()
    mine = feature_affinity(jnp.asarray(fused))
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-5, rtol=1e-4)


def test_seg_loss_parity(oracle):
    torch, _, _, losses, _, _ = oracle
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 21, 24, 24)).astype(np.float32)
    label = rng.integers(0, 21, size=(2, 24, 24))
    label[0, :4] = 255
    ref = losses.get_seg_loss(torch.from_numpy(logits),
                              torch.from_numpy(label).long()).item()
    mine = seg_loss(jnp.asarray(logits), jnp.asarray(label))
    np.testing.assert_allclose(float(mine), ref, atol=1e-5, rtol=1e-5)


def test_aff_loss_parity(oracle):
    torch, _, _, losses, _, _ = oracle
    rng = np.random.default_rng(4)
    inputs = rng.uniform(0, 1, size=(2, 36, 36)).astype(np.float32)
    targets = rng.choice([0, 1, 255], size=(2, 36, 36)).astype(np.int64)
    ref, _, _ = losses.get_aff_loss(torch.from_numpy(inputs),
                                    torch.from_numpy(targets))
    mine = aff_loss(jnp.asarray(inputs), jnp.asarray(targets))
    np.testing.assert_allclose(float(mine), ref.item(), atol=1e-6, rtol=1e-5)


def test_dropout_channel_semantics():
    """Dropout2d drops whole channels per sample and rescales."""
    cfg = HeadConfig(embedding_dim=8, in_channels=4, num_blocks=2)
    from excel_tpu.models.head import init_head_params
    params = init_head_params(jax.random.PRNGKey(0), cfg, 5)
    feats = jnp.ones((2, 3, 16, 4))
    out = segformer_fuse(params, feats, cfg,
                         dropout_rng=jax.random.PRNGKey(1), dropout_rate=0.5)
    out = np.asarray(out)
    for b in range(out.shape[0]):
        for c in range(out.shape[-1]):
            col = out[b, :, c]
            assert np.all(col == 0) or np.all(col != 0)


def test_convert_head_cli_roundtrip(tmp_path):
    """cli.convert_head: a reference-style full checkpoint (DDP 'module.'
    prefix, frozen-encoder keys included) -> head .npz that loads bitwise
    into the init-param template the infer CLIs use."""
    torch = pytest.importorskip("torch")
    from excel_tpu.cli.convert_head import main as convert_head_main
    from excel_tpu.config import voc_config
    from excel_tpu.engine.checkpoint import load_head_npz
    from excel_tpu.models.head import init_head_params

    cfg = voc_config()
    hc = cfg.head
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    d = hc.embedding_dim
    sd = {"encoder.visual.conv1.weight": t(4, 3, 2, 2)}     # must be dropped
    for i in range(hc.num_blocks):
        p = f"decoder_fts_fuse.linears_modulelist.{i}"
        sd[p + ".proj.weight"] = t(d, hc.in_channels)
        sd[p + ".proj.bias"] = t(d)
        sd[p + ".proj_2.weight"] = t(d, d)
        sd[p + ".proj_2.bias"] = t(d)
    sd["decoder_fts_fuse.linear_fuse.weight"] = t(d, d * hc.num_blocks, 1, 1)
    sd["decoder_fts_fuse.linear_fuse.bias"] = t(d)
    for i in range(hc.decoder_layers):
        p = f"decoder.transformer.resblocks.{i}"
        for ln in (".ln_1", ".ln_2"):
            sd[p + ln + ".weight"] = t(d)
            sd[p + ln + ".bias"] = t(d)
        sd[p + ".attn.in_proj_weight"] = t(3 * d, d)
        sd[p + ".attn.in_proj_bias"] = t(3 * d)
        sd[p + ".attn.out_proj.weight"] = t(d, d)
        sd[p + ".attn.out_proj.bias"] = t(d)
        sd[p + ".mlp.c_fc.weight"] = t(4 * d, d)
        sd[p + ".mlp.c_fc.bias"] = t(4 * d)
        sd[p + ".mlp.c_proj.weight"] = t(d, 4 * d)
        sd[p + ".mlp.c_proj.bias"] = t(d)
    sd["decoder.linear_pred.weight"] = t(cfg.num_classes, d, 1, 1)
    sd["decoder.linear_pred.bias"] = t(cfg.num_classes)

    src = tmp_path / "model_iter_30000.pth"
    dst = tmp_path / "head_30000.npz"
    torch.save({"module." + k: v for k, v in sd.items()}, str(src))
    convert_head_main([str(src), str(dst), "--dataset", "voc"])

    template = init_head_params(jax.random.PRNGKey(0), hc, cfg.num_classes)
    loaded = load_head_npz(str(dst), template)
    direct = convert_torch_head({k: v.numpy() for k, v in sd.items()}, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
