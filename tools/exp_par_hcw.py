"""HCW-fp32 vs CHW-bf16 PAR diffusion at the PRODUCTION shape.

The fp32 [B, H, C, W] kernel (channels in sublanes — dy slices the free
leading dim, nothing realigns per channel) was measured ~5x the CHW kernel
in an earlier round, but the bf16 production path kept CHW (Mosaic
sublane-16 broadcast bug) and HCW has no valid-extent clamp. This times
both at the headline bench shape (B=16, C=5, 384x512, 20 iters) to decide
whether a valid-clamp HCW variant is worth building.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.ops.par import _offsets
from excel_tpu.ops.par_pallas import (pad_for_diffuse, pad_for_diffuse_hcw,
                                      par_diffuse_padded,
                                      par_diffuse_padded_hcw,
                                      par_diffuse_padded_valid)
from excel_tpu.utils.profiling import benchmark

B, C, H, W = 16, 5, 384, 512
DIL = (1, 2, 4, 8, 12, 24)
ITERS = 20


def main():
    rng = np.random.default_rng(0)
    offs = tuple(_offsets(DIL))
    k = len(offs)
    pad = 24
    masks = jnp.asarray(rng.random((B, C, H, W), np.float32))
    aff32 = jnp.asarray(rng.random((B, k, H, W), np.float32)) / k
    valid = jnp.asarray([[375, 500]] * B, jnp.int32)

    cases = []

    mp16 = jax.block_until_ready(pad_for_diffuse(masks.astype(jnp.bfloat16),
                                                 pad))
    a16 = aff32.astype(jnp.bfloat16)
    cases.append(("CHW bf16 valid (production)", mp16, a16,
                  lambda m, a: par_diffuse_padded_valid(m, a, valid, offs,
                                                        H, W)))
    cases.append(("CHW bf16 no-valid", mp16, a16,
                  lambda m, a: par_diffuse_padded(m, a, offs, H, W)))

    mph = jax.block_until_ready(pad_for_diffuse_hcw(masks, pad))
    cases.append(("HCW fp32 no-valid", mph, aff32,
                  lambda m, a: par_diffuse_padded_hcw(m, a, offs, H, W)))

    for name, m0, a, step in cases:
        @jax.jit
        def loop(m, a, step=step):
            return jax.lax.fori_loop(0, ITERS, lambda _, x: step(x, a), m)
        jax.block_until_ready(loop(m0, a))
        r = benchmark(loop, m0, a, iters=6)
        print(f"{name:28s}: {r['ms']:8.2f} ms ({r['ms'] / ITERS:6.3f} ms/iter)",
              flush=True)


if __name__ == "__main__":
    main()
