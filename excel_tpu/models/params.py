"""Parameter pytree construction: random init and OpenAI-checkpoint conversion.

The frozen CLIP weights come from a converted asset (OpenAI `.pt` state dict
-> numpy -> this pytree); training checkpoints never contain them
(SURVEY.md §5.4). Conversion handles the torch layout differences:
Linear weights are [out,in] -> transposed to [in,out], the patch conv is
OIHW -> HWIO, and each block's fused in_proj becomes the qkv weight.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ClipConfig


# ---------------------------------------------------------------------------
# random init (tests, dryruns, training-from-scratch experiments)
# ---------------------------------------------------------------------------

def _init_block(key, width: int, scale_attn: float, scale_proj: float,
                scale_fc: float) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "ln_1": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "attn": {
            "qkv": {"w": jax.random.normal(ks[0], (width, 3 * width)) * scale_attn,
                    "b": jnp.zeros(3 * width)},
            "out": {"w": jax.random.normal(ks[1], (width, width)) * scale_proj,
                    "b": jnp.zeros(width)},
        },
        "ln_2": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "mlp": {
            "fc": {"w": jax.random.normal(ks[2], (width, 4 * width)) * scale_fc,
                   "b": jnp.zeros(4 * width)},
            "proj": {"w": jax.random.normal(ks[3], (4 * width, width)) * scale_proj,
                     "b": jnp.zeros(width)},
        },
    }


def init_clip_params(key: jax.Array, cfg: ClipConfig) -> dict:
    kv, kt = jax.random.split(key)
    vw, tw = cfg.vision_width, cfg.text_width
    v_keys = jax.random.split(kv, cfg.vision_layers + 4)
    t_keys = jax.random.split(kt, cfg.text_layers + 4)

    proj_std = (tw ** -0.5) * ((2 * cfg.text_layers) ** -0.5)
    attn_std = tw ** -0.5
    fc_std = (2 * tw) ** -0.5
    v_scale = vw ** -0.5

    visual = {
        "patch_embed": jax.random.normal(
            v_keys[0], (cfg.patch_size, cfg.patch_size, 3, vw)) * v_scale,
        "class_embedding": jax.random.normal(v_keys[1], (vw,)) * v_scale,
        "positional_embedding": jax.random.normal(
            v_keys[2], (cfg.pretrain_grid ** 2 + 1, vw)) * v_scale,
        "ln_pre": {"scale": jnp.ones(vw), "bias": jnp.zeros(vw)},
        "blocks": [
            _init_block(v_keys[4 + i], vw, v_scale,
                        v_scale * (2 * cfg.vision_layers) ** -0.5,
                        (2 * vw) ** -0.5)
            for i in range(cfg.vision_layers)
        ],
        "ln_post": {"scale": jnp.ones(vw), "bias": jnp.zeros(vw)},
        "proj": jax.random.normal(v_keys[3], (vw, cfg.embed_dim)) * v_scale,
    }
    text = {
        "token_embedding": jax.random.normal(
            t_keys[0], (cfg.vocab_size, tw)) * 0.02,
        "positional_embedding": jax.random.normal(
            t_keys[1], (cfg.context_length, tw)) * 0.01,
        "blocks": [
            _init_block(t_keys[4 + i], tw, attn_std, proj_std, fc_std)
            for i in range(cfg.text_layers)
        ],
        "ln_final": {"scale": jnp.ones(tw), "bias": jnp.zeros(tw)},
        "text_projection": jax.random.normal(
            t_keys[2], (tw, cfg.embed_dim)) * attn_std,
    }
    return {"visual": visual, "text": text,
            "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32)}


# ---------------------------------------------------------------------------
# torch state-dict conversion
# ---------------------------------------------------------------------------

def _ln(sd: dict, prefix: str) -> dict:
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def _block_from_torch(sd: dict, prefix: str) -> dict:
    return {
        "ln_1": _ln(sd, prefix + ".ln_1"),
        "attn": {
            "qkv": {"w": jnp.asarray(sd[prefix + ".attn.in_proj_weight"]).T,
                    "b": jnp.asarray(sd[prefix + ".attn.in_proj_bias"])},
            "out": {"w": jnp.asarray(sd[prefix + ".attn.out_proj.weight"]).T,
                    "b": jnp.asarray(sd[prefix + ".attn.out_proj.bias"])},
        },
        "ln_2": _ln(sd, prefix + ".ln_2"),
        "mlp": {
            "fc": {"w": jnp.asarray(sd[prefix + ".mlp.c_fc.weight"]).T,
                   "b": jnp.asarray(sd[prefix + ".mlp.c_fc.bias"])},
            "proj": {"w": jnp.asarray(sd[prefix + ".mlp.c_proj.weight"]).T,
                     "b": jnp.asarray(sd[prefix + ".mlp.c_proj.bias"])},
        },
    }


def infer_clip_config(sd: dict, **overrides) -> ClipConfig:
    """Derive architecture hyperparams from tensor shapes (build_model.py:30-75)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = len({
        int(m.group(1))
        for k in sd
        if (m := re.match(r"visual\.transformer\.resblocks\.(\d+)\.", k))
    })
    text_width = sd["positional_embedding"].shape[1]
    text_layers = len({
        int(m.group(1))
        for k in sd
        if (m := re.match(r"transformer\.resblocks\.(\d+)\.", k))
    })
    kwargs = dict(
        patch_size=patch_size,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_heads=vision_width // 64,
        embed_dim=sd["text_projection"].shape[1],
        pretrain_grid=grid,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=text_layers,
    )
    kwargs.update(overrides)
    return ClipConfig(**kwargs)


def convert_torch_state_dict(sd: dict, cfg: ClipConfig) -> dict:
    """Numpy-valued torch state dict (OpenAI CLIP naming) -> our param pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    visual = {
        "patch_embed": jnp.asarray(
            sd["visual.conv1.weight"].transpose(2, 3, 1, 0)),  # OIHW->HWIO
        "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
        "positional_embedding": jnp.asarray(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": [
            _block_from_torch(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)
        ],
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": jnp.asarray(sd["visual.proj"]),
    }
    text = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "blocks": [
            _block_from_torch(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.text_layers)
        ],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": jnp.asarray(sd["text_projection"]),
    }
    return {"visual": visual, "text": text,
            "logit_scale": jnp.asarray(sd["logit_scale"])}


def save_params_npz(path: str, params: dict) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def load_params_npz(path: str, cfg: ClipConfig) -> dict:
    data = np.load(path)
    template = jax.eval_shape(lambda: init_clip_params(jax.random.PRNGKey(0), cfg))
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def cast_matmul_weights(params: dict, dtype) -> dict:
    """One-time copy of the matmul weights ('w'/'b' leaves) in `dtype`.

    layers.linear casts weights to the activation dtype at every use; with
    fp32-stored weights in bf16 compute mode that re-reads and converts the
    full frozen pytree each step (~900 MB / ViT-B/16 forward — ~20% of the
    encoder's device time). Casting once up front makes the per-use astype
    a no-op with bit-identical results. Only apply alongside a bf16
    compute_dtype; LayerNorm/embedding leaves stay fp32."""
    def walk(d):
        if isinstance(d, dict):
            return {k: (v.astype(dtype)
                        if k in ("w", "b") and hasattr(v, "astype")
                        else walk(v))
                    for k, v in d.items()}
        if isinstance(d, (list, tuple)):
            return type(d)(walk(x) for x in d)
        return d
    return walk(params)
