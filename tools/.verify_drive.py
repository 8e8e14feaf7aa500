import sys

sys.path.insert(0, "/root/repo")
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import voc_config
from excel_tpu.engine.evaluate import _slots_bucket, lam_eval_hist_step
from excel_tpu.models.params import init_clip_params
from excel_tpu.utils.metrics import init_hist, scores_from_hist

cfg = voc_config()
cfg = dataclasses.replace(
    cfg,
    clip=dataclasses.replace(cfg.clip, vision_layers=2, surgery_blocks=1,
                             attn_out_layers=1, vision_width=64,
                             vision_heads=2, embed_dim=32,
                             image_size=64, fused_attention=False),
    refine=dataclasses.replace(cfg.refine, par_iters=2, par_dilations=(1, 2)))
key = jax.random.PRNGKey(0)
params = {"clip": init_clip_params(key, cfg.clip)}
rng = np.random.default_rng(0)
B = 2
CANVAS = (96, 128)
im = jnp.asarray(rng.random((B, 64, 64, 3), np.float32) * 255)
cls = np.zeros((B, 20), np.float32)
cls[:, :3] = 1.0
slots = _slots_bucket(cls, 20)
print("bucket for 3-class batch:", slots)
assert slots == 3
ta = jax.random.normal(key, (45, 32))
ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)
# GT carries 255 outside the valid extents (as the loader pads it)
gt_np = np.full((B,) + CANVAS, 255, np.int32)
gt_np[:, :90, :120] = 0
gt = jnp.asarray(gt_np)
valid = jnp.asarray([[90, 120]] * B, jnp.int32)
h = init_hist(21)
h = lam_eval_hist_step(h, params, im, jnp.asarray(cls), gt, valid, ta, cfg,
                       CANVAS, "training_free", class_slots=slots)
h = np.asarray(h)
print("hist total px:", h.sum(), "expected:", B * 90 * 120)
assert h.sum() == B * 90 * 120
s = scores_from_hist(h)
print("pAcc:", round(float(s["pAcc"]), 4), "mIoU:", round(float(s["miou"]), 4))
print("OK: 3-slot bucket + bf16 hist drive end-to-end")
