"""PAR diffusion rotation-cost attribution at the PRODUCTION shape.

The diffusion inner loop slices the slab at 48 static (dy, dx) offsets;
Mosaic realigns each slice (sublane roll for dy, lane rotate for dx) before
the fused multiply-add. This experiment times the per-iteration kernel with
doctored offset tuples of the same length:

  real      48 true offsets            (production cost)
  dy-only   (dy, 0)   per offset       (no lane rotates)
  dx-only   (0, dx)   per offset       (no sublane rolls)
  none      (0, 0) x 48                (pure fma floor + loop overhead)

Differences attribute the realignment overhead and bound what a
pre-rotation scheme could save. Shapes: B=16, C=5 (4-slot bucket + bkg),
384x512 canvas, bf16 — the headline bench's PAR call.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.ops.par import _offsets
from excel_tpu.ops.par_pallas import (pad_for_diffuse, par_diffuse_padded_valid,
                                      par_diffuse_valid_resident,
                                      resident_tile_for)
from excel_tpu.utils.profiling import benchmark

B, C, H, W = 16, 5, 384, 512
DIL = (1, 2, 4, 8, 12, 24)
ITERS = 20


def main():
    rng = np.random.default_rng(0)
    offs = tuple(_offsets(DIL))
    k = len(offs)
    pad = 24
    masks = jnp.asarray(rng.random((B, C, H, W), np.float32)).astype(
        jnp.bfloat16)
    aff = (jnp.asarray(rng.random((B, k, H, W), np.float32)) / k).astype(
        jnp.bfloat16)
    valid = jnp.asarray([[375, 500]] * B, jnp.int32)
    mp = jax.block_until_ready(pad_for_diffuse(masks, pad))

    # the kernel derives its pad from max|offset|: keep one (24, 0) entry in
    # every doctored tuple so the pad (and so slab/DMA shapes) matches `real`
    variants = {
        "real": offs,
        "dy-only": tuple((dy, 0) for dy, _ in offs),
        "dx-only": ((24, 0),) + tuple((0, dx) for _, dx in offs[1:]),
        "none": ((24, 0),) + ((0, 0),) * (k - 1),
    }
    for name, ov in variants.items():
        @jax.jit
        def loop(m, a, ov=ov):
            return jax.lax.fori_loop(
                0, ITERS,
                lambda _, x: par_diffuse_padded_valid(x, a, valid, ov, H, W),
                m)
        jax.block_until_ready(loop(mp, aff))
        r = benchmark(loop, mp, aff, iters=6)
        print(f"per-iter kernel x{ITERS} [{name:8s}]: {r['ms']:8.2f} ms "
              f"({r['ms'] / ITERS:6.3f} ms/iter)")

    th = resident_tile_for(mp.shape, aff.dtype, H, W, k)
    print(f"resident tile: {th}")
    if th is not None:
        @jax.jit
        def res(m, a):
            return par_diffuse_valid_resident(m, a, valid, offs, H, W, ITERS)
        jax.block_until_ready(res(mp, aff))
        r = benchmark(res, mp, aff, iters=6)
        print(f"resident kernel x{ITERS} [real  ]: {r['ms']:8.2f} ms "
              f"({r['ms'] / ITERS:6.3f} ms/iter)")


if __name__ == "__main__":
    main()
