"""Time the XLA glue around the PAR kernels, op by op, on the real TPU.

exp_lam_ablate puts ~4.8 ms in "PAR build+1it" while the affinity kernel
and guide upscale each difference to ~0 — so the cost hides in the XLA
passes: _replicate_valid (one-hot einsum border extraction), the
edge-pads of pad_for_diffuse, the canvas upscales, the bf16 cast. Each is
timed as K serialized in-program copies (profile_encoder.chained_ms
technique) so the tunnel's per-dispatch floor divides away.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.ops.labels import (cams_with_background_canvas,
                                  upscale_to_canvas, upscale_to_canvas_align)
from excel_tpu.ops.par import _offsets, _pos_weight, _replicate_valid
from excel_tpu.ops.par_pallas import pad_for_diffuse, par_affinity
from excel_tpu.utils.profiling import benchmark

B = int(os.environ.get("BENCH_BATCH", "16"))
CANVAS = (384, 512)
K = 8


def chained_ms(step, *args) -> float:
    def prog(x0, *rest):
        acc = jnp.float32(0)
        x = x0
        for _ in range(K):
            s = step(x, *rest)
            acc = acc + s
            x = x + (s * jnp.float32(1e-30)).astype(x.dtype)
        return acc
    prog = jax.jit(prog)
    jax.block_until_ready(prog(*args))
    return benchmark(prog, *args, iters=4)["ms"] / K


def main():
    h, w = CANVAS
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, 3, h, w), np.float32))
    masks = jnp.asarray(rng.random((B, 4, h, w), np.float32))
    masks_bf = masks.astype(jnp.bfloat16)
    refined = jnp.asarray(rng.random((B, 3, 20, 20), np.float32))
    cls = jnp.ones((B, 3), jnp.float32)
    sizes = [[375, 500], [333, 500], [375, 500], [334, 500],
             [375, 500], [360, 480], [375, 500], [342, 500]]
    valid = jnp.asarray((sizes * ((B + 7) // 8))[:B], jnp.int32)
    dil = (1, 2, 4, 8, 12, 24)
    offs = tuple(_offsets(dil))
    pad = 24
    pos_w = tuple(float(x) for x in _pos_weight(dil))

    def rec(name, ms):
        print(f"{name:44s} {ms:8.3f} ms", flush=True)

    rec("replicate_valid imgs [B,3,384,512] f32",
        chained_ms(lambda x: _replicate_valid(x, valid)
                   .astype(jnp.float32).sum(), imgs))
    rec("replicate_valid masks [B,4,384,512] f32",
        chained_ms(lambda x: _replicate_valid(x, valid)
                   .astype(jnp.float32).sum(), masks))
    rec("replicate_valid masks bf16",
        chained_ms(lambda x: _replicate_valid(x, valid)
                   .astype(jnp.float32).sum(), masks_bf))
    rec("pad_for_diffuse imgs f32",
        chained_ms(lambda x: pad_for_diffuse(x, pad)
                   .astype(jnp.float32).sum(), imgs))
    rec("pad_for_diffuse masks bf16",
        chained_ms(lambda x: pad_for_diffuse(x, pad)
                   .astype(jnp.float32).sum(), masks_bf))
    rec("cams_with_background_canvas [B,3,20,20]",
        chained_ms(lambda x: cams_with_background_canvas(
            x, cls, valid, CANVAS).astype(jnp.float32).sum(), refined))
    rec("upscale_to_canvas_align [B,3,320,320]",
        chained_ms(lambda x: upscale_to_canvas_align(x, valid, CANVAS)
                   .astype(jnp.float32).sum(),
                   jnp.asarray(rng.random((B, 3, 320, 320), np.float32))))
    rec("upscale_to_canvas [B,4,20,20]",
        chained_ms(lambda x: upscale_to_canvas(x, valid, CANVAS)
                   .astype(jnp.float32).sum(),
                   jnp.asarray(rng.random((B, 4, 20, 20), np.float32))))

    def aff_step(x):
        mp = pad_for_diffuse(_replicate_valid(x, valid), pad)
        a = par_affinity(mp, offs, pos_w, h, w)
        return a.astype(jnp.float32).sum()
    rec("replicate+pad+par_affinity (full guide path)",
        chained_ms(aff_step, imgs))

    def mask_prep(x):
        mp = pad_for_diffuse(_replicate_valid(x, valid), pad)
        return mp.astype(jnp.float32).sum()
    rec("replicate+pad masks bf16 (full mask prep)",
        chained_ms(mask_prep, masks_bf))


if __name__ == "__main__":
    main()
