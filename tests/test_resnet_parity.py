"""Golden parity of the ModifiedResNet tower vs the reference torch code
(clip/clip_model.py:10-168), random weights + randomized BN running stats."""
import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from excel_tpu.models.resnet import (convert_resnet_tower,
                                     infer_resnet_config, is_resnet_state_dict,
                                     resnet_forward)

REF_PATH = "/root/reference/clip/clip_model.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def oracle():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("_ref_clip_model", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    model = mod.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=8,
                               input_resolution=64, width=16).float()
    # randomized BN running stats so inference-form normalization is
    # actually exercised (fresh init is mean 0 / var 1)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()

    sd = {"visual." + k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}
    assert is_resnet_state_dict(sd)
    cfg = infer_resnet_config(sd)
    assert cfg.layers == (1, 1, 1, 1) and cfg.width == 16
    assert cfg.heads == 8 and cfg.embed_dim == 32 and cfg.image_size == 64
    params = convert_resnet_tower(sd, cfg)
    return torch, model, cfg, params


def test_resnet_forward_parity(oracle):
    torch, model, cfg, params = oracle
    g = torch.Generator().manual_seed(1)
    x = torch.rand(2, 3, 64, 64, generator=g) * 2 - 1
    with torch.no_grad():
        ref = model(x).numpy()
    ours = np.asarray(resnet_forward(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg))
    assert ref.shape == ours.shape == (2, 1 + 2 * 2, 32)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_resnet_pos_interpolation_parity(oracle):
    """Varied input size: the reference mutates its pos-emb parameter in
    place (clip_model.py:77-84); ours recomputes functionally. Use a fresh
    oracle call so the mutation matches a single-size run."""
    torch, model, cfg, params = oracle
    g = torch.Generator().manual_seed(2)
    x = torch.rand(1, 3, 96, 96, generator=g)
    with torch.no_grad():
        ref = model(x).numpy()
    ours = np.asarray(resnet_forward(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg))
    assert ref.shape == ours.shape == (1, 1 + 3 * 3, 32)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
