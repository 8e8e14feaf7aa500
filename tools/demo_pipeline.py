"""End-to-end demo: training-free LAM pseudo-labels on a synthetic image.

Runs the full frozen-encoder pipeline (surgery-CLIP forward -> feature
surgery LAMs -> SVC affinity refinement -> PAR -> argmax pseudo-label) on
the real TPU chip (or CPU fallback), with random-initialized weights and a
synthetic image. Prints timing and output stats. For real weights, convert
the OpenAI checkpoint with tools/convert_assets.py and pass --params.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None,
                    help="converted CLIP params .npz (default: random init)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=320)
    args = ap.parse_args()

    from excel_tpu.config import voc_config
    from excel_tpu.engine.pipeline import training_free_step
    from excel_tpu.models.params import init_clip_params, load_params_npz

    cfg = voc_config()
    if args.image_size != cfg.clip.image_size:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, clip=dataclasses.replace(cfg.clip,
                                          image_size=args.image_size))

    key = jax.random.PRNGKey(0)
    if args.params:
        clip_params = load_params_npz(args.params, cfg.clip)
    else:
        clip_params = init_clip_params(key, cfg.clip)

    size = cfg.clip.image_size
    rng = np.random.default_rng(0)
    # synthetic image: colored blobs on noise
    images = rng.integers(0, 64, (args.batch, size, size, 3), dtype=np.uint8)
    images[:, 80:220, 60:180] += 150
    cls_label = np.zeros((args.batch, cfg.num_fg), np.float32)
    cls_label[:, [0, 7, 14]] = 1.0
    text_attr = jax.random.normal(key, (cfg.num_fg + 25, cfg.clip.embed_dim))
    text_attr = text_attr / jnp.linalg.norm(text_attr, axis=-1, keepdims=True)

    print(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    labels = training_free_step(clip_params, jnp.asarray(images),
                                jnp.asarray(cls_label), text_attr, cfg)
    jax.block_until_ready(labels)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    labels = training_free_step(clip_params, jnp.asarray(images),
                                jnp.asarray(cls_label), text_attr, cfg)
    jax.block_until_ready(labels)
    t_run = time.perf_counter() - t0

    labels = np.asarray(labels)
    vals, counts = np.unique(labels, return_counts=True)
    print(f"compile+run: {t_compile:.2f}s   steady-state: {t_run * 1e3:.1f}ms "
          f"({args.batch / t_run:.1f} img/s)")
    print(f"pseudo-label shape: {labels.shape}  dtype: {labels.dtype}")
    print("label histogram:",
          {int(v): int(c) for v, c in zip(vals, counts)})
    assert labels.shape == (args.batch, size, size)
    assert set(vals) <= set(range(cfg.num_classes)) | {255}
    print("OK")


if __name__ == "__main__":
    main()
