"""Vanilla CLIP's ModifiedResNet vision tower (reference
clip/clip_model.py:10-168), TPU-native.

Completes component C5 (SURVEY.md §2.1): the reference's vanilla CLIP ships
both a ViT and this anti-aliased ResNet with attention pooling. No ExCEL
entry point runs the ResNet (the offline attribute clustering loads
"ViT-B/16"), but a vanilla-CLIP user switching to this framework may hold
RN50-family weights; this module makes them loadable and runnable.

Differences from torchvision ResNet, replicated from the reference:
- 3-conv stem (stride 2 on conv1) + AvgPool2d(2) instead of 1 conv + maxpool
- anti-aliased downsampling: stride>1 convs become stride-1 conv preceded by
  AvgPool2d(stride), in both the residual and the downsample branch
  (clip_model.py:16-40)
- final pooling is QKV attention over mean-prepended tokens with a learned
  positional embedding, bilinearly re-interpolated for varied input sizes
  (clip_model.py:59-106); like the reference's modified copy it returns ALL
  tokens [B, 1+HW, C], not just the pooled CLS (clip_model.py:105-106).

Functional style as models/clip.py: a param pytree + pure forward. BatchNorm
runs in inference form (running stats; the CLIP encoder is frozen
everywhere in ExCEL). Layout is NHWC/HWIO internally (TPU-native conv
layout); the public API takes NHWC images like encode_image.
"""
from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from .layers import _softmax32


@dataclasses.dataclass(frozen=True)
class ResNetClipConfig:
    """ModifiedResNet tower hyperparams (build_model.py:34-46 inference)."""
    layers: tuple[int, ...] = (3, 4, 6, 3)          # RN50
    width: int = 64
    embed_dim: int = 1024                            # output (text) dim
    heads: int = 32                                  # width * 32 // 64
    image_size: int = 224

    @property
    def feat_dim(self) -> int:                       # attnpool input dim
        return self.width * 32

    @property
    def pretrain_grid(self) -> int:
        return self.image_size // 32


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x: jax.Array, w: jax.Array, stride: int = 1,
          padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN)


def _bn(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    if k <= 1:
        return x
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (1, k, k, 1), (1, k, k, 1), "VALID")
    return s / (k * k)


def _bottleneck(p: dict, x: jax.Array, stride: int) -> jax.Array:
    """clip_model.py:42-56: 1x1 -> 3x3 -> avgpool(stride) -> 1x1, with an
    avgpool-then-1x1 downsample branch when shape changes."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"]))
    out = _avg_pool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(_avg_pool(x, stride), p["downsample"]["conv"]),
                p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _attention_pool(p: dict, x: jax.Array, heads: int) -> jax.Array:
    """clip_model.py:59-106: mean-prepended QKV attention pooling; returns
    all tokens [B, 1+HW, out_dim]."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], 1)

    pos = p["positional_embedding"]                  # [1+S*S, C]
    side = int(round((pos.shape[0] - 1) ** 0.5))
    if side != h or h != w:
        grid = pos[1:].reshape(side, side, c)
        # torch F.interpolate(..., mode='bilinear', align_corners=False)
        grid = jax.image.resize(grid, (h, w, c), method="bilinear")
        pos = jnp.concatenate([pos[:1], grid.reshape(h * w, c)], 0)
    y = tokens + pos[None]

    d = c // heads
    q = y @ p["q_proj"]["w"] + p["q_proj"]["b"]
    k = y @ p["k_proj"]["w"] + p["k_proj"]["b"]
    v = y @ p["v_proj"]["w"] + p["v_proj"]["b"]
    n = y.shape[1]
    q = q.reshape(b, n, heads, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    k = k.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
    attn = _softmax32(q @ k.transpose(0, 1, 3, 2))
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
    return o @ p["c_proj"]["w"] + p["c_proj"]["b"]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def resnet_forward(params: dict, images: jax.Array,
                   cfg: ResNetClipConfig) -> jax.Array:
    """images: [B, H, W, 3] normalized. Returns [B, 1+HW/1024, embed_dim]
    (CLS first, then the 1/32-resolution token map, like the reference's
    modified AttentionPool2d return)."""
    x = images
    for i in (1, 2, 3):
        x = jax.nn.relu(_bn(_conv(x, params[f"conv{i}"],
                                  stride=2 if i == 1 else 1, padding=1),
                            params[f"bn{i}"]))
    x = _avg_pool(x, 2)
    for li, blocks in enumerate(params["layers"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            x = _bottleneck(bp, x, stride if bi == 0 else 1)
    return _attention_pool(params["attnpool"], x, cfg.heads)


# ---------------------------------------------------------------------------
# conversion / init
# ---------------------------------------------------------------------------

def is_resnet_state_dict(sd: dict) -> bool:
    """build_model.py:34-40: ResNet CLIPs have visual.layer*.blocks."""
    return any(k.startswith("visual.layer1.") for k in sd)


def infer_resnet_config(sd: dict, **overrides) -> ResNetClipConfig:
    sd_keys = list(sd)
    counts = []
    for li in (1, 2, 3, 4):
        blocks = {int(m.group(1)) for k in sd_keys
                  if (m := re.match(rf"visual\.layer{li}\.(\d+)\.", k))}
        counts.append(len(blocks))
    width = sd["visual.conv1.weight"].shape[0] * 2
    embed_dim = sd["visual.attnpool.c_proj.weight"].shape[0]
    feat = width * 32
    grid = int(round((sd["visual.attnpool.positional_embedding"].shape[0]
                      - 1) ** 0.5))
    kwargs = dict(layers=tuple(counts), width=width, embed_dim=embed_dim,
                  heads=feat // 64, image_size=grid * 32)
    kwargs.update(overrides)
    return ResNetClipConfig(**kwargs)


def _bn_from_torch(sd: dict, prefix: str) -> dict:
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
            "mean": jnp.asarray(sd[prefix + ".running_mean"]),
            "var": jnp.asarray(sd[prefix + ".running_var"])}


def _conv_from_torch(sd: dict, key: str) -> jax.Array:
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0))  # OIHW->HWIO


def _linear_from_torch(sd: dict, prefix: str) -> dict:
    return {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T),
            "b": jnp.asarray(sd[prefix + ".bias"])}


def convert_resnet_tower(sd: dict, cfg: ResNetClipConfig) -> dict:
    """torch state dict (OpenAI RN naming, 'visual.' prefix) -> param pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv_from_torch(sd, f"visual.conv{i}.weight")
        params[f"bn{i}"] = _bn_from_torch(sd, f"visual.bn{i}")
    layers = []
    for li, n_blocks in enumerate(cfg.layers, start=1):
        blocks = []
        for bi in range(n_blocks):
            pre = f"visual.layer{li}.{bi}"
            bp = {
                "conv1": _conv_from_torch(sd, pre + ".conv1.weight"),
                "bn1": _bn_from_torch(sd, pre + ".bn1"),
                "conv2": _conv_from_torch(sd, pre + ".conv2.weight"),
                "bn2": _bn_from_torch(sd, pre + ".bn2"),
                "conv3": _conv_from_torch(sd, pre + ".conv3.weight"),
                "bn3": _bn_from_torch(sd, pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": _conv_from_torch(sd, pre + ".downsample.0.weight"),
                    "bn": _bn_from_torch(sd, pre + ".downsample.1"),
                }
            blocks.append(bp)
        layers.append(blocks)
    params["layers"] = layers
    ap = "visual.attnpool"
    params["attnpool"] = {
        "positional_embedding": jnp.asarray(
            sd[ap + ".positional_embedding"]),
        "q_proj": _linear_from_torch(sd, ap + ".q_proj"),
        "k_proj": _linear_from_torch(sd, ap + ".k_proj"),
        "v_proj": _linear_from_torch(sd, ap + ".v_proj"),
        "c_proj": _linear_from_torch(sd, ap + ".c_proj"),
    }
    return params
