"""PAR diffusion micro-breakdown on the real TPU.

Isolates: the padded-loop Pallas step (per tile_h), the XLA valid-extent
clamp, and the full par_refine, at the headline shapes (B=16, C=21,
384x512 canvas, bf16)."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.ops.par import (_clamp_valid_padded, _offsets, par_refine,
                               _replicate_valid)
from excel_tpu.ops.par_pallas import pad_for_diffuse, par_diffuse_padded
from excel_tpu.utils.profiling import benchmark

B, C, H, W = 16, 21, 384, 512
DIL = (1, 2, 4, 8, 12, 24)
ITERS = 20


def main():
    rng = np.random.default_rng(0)
    offs = tuple(_offsets(DIL))
    pad = 24
    guide = jnp.asarray(rng.random((B, 3, H, W), np.float32))
    cams = jnp.asarray(rng.random((B, C, H, W), np.float32))
    aff = jnp.asarray(rng.random((B, len(offs), H, W), np.float32)
                      / len(offs)).astype(jnp.bfloat16)
    valid = jnp.asarray([[375, 500]] * B, jnp.int32)
    mp = jax.block_until_ready(
        pad_for_diffuse(cams.astype(jnp.bfloat16), pad))

    for th in (8, 16, 32):
        @jax.jit
        def loop_nc(m, a, th=th):
            return jax.lax.fori_loop(
                0, ITERS,
                lambda _, x: par_diffuse_padded(x, a, offs, H, W, tile_h=th),
                m)
        try:
            jax.block_until_ready(loop_nc(mp, aff))
            r = benchmark(loop_nc, mp, aff, iters=6)
            print(f"kernel-only x{ITERS}, tile_h={th:3d}: {r['ms']:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"tile_h={th}: FAILED {type(e).__name__}: {str(e)[:120]}")

    @jax.jit
    def clamp_loop(m):
        return jax.lax.fori_loop(
            0, ITERS, lambda _, x: _clamp_valid_padded(x, valid, pad), m)

    jax.block_until_ready(clamp_loop(mp))
    r = benchmark(clamp_loop, mp, iters=6)
    print(f"clamp-only  x{ITERS}:           {r['ms']:8.2f} ms")

    full = jax.jit(functools.partial(
        par_refine, dilations=DIL, num_iter=ITERS, dtype=jnp.bfloat16))
    jax.block_until_ready(full(guide, cams, valid_hw=valid))
    r = benchmark(lambda g, c: full(g, c, valid_hw=valid), guide, cams,
                  iters=6)
    print(f"full par_refine:            {r['ms']:8.2f} ms")


if __name__ == "__main__":
    main()
