"""Encoder wall time: fused Pallas attention vs pure-XLA attention.

One jitted vision_forward per config (dispatch overhead amortized inside
the call), B=16, 320px/401tok and 480px/901tok, attn_mode mean/none.
Decides whether the Pallas kernels still beat XLA now that the consumers
need only the block-mean (training-free) or nothing (seg branch).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.config import fast, voc_config
from excel_tpu.models.clip import vision_forward
from excel_tpu.models.params import cast_matmul_weights, init_clip_params
from excel_tpu.utils.profiling import benchmark

B = 16


def main():
    base = fast(voc_config()).clip
    key = jax.random.PRNGKey(0)
    params = cast_matmul_weights(init_clip_params(key, base), jnp.bfloat16)
    rng = np.random.default_rng(0)

    import os
    pxs = tuple(int(x) for x in os.environ.get('PX', '320,480').split(','))
    for px in pxs:
        im = jnp.asarray(rng.random((B, px, px, 3), np.float32))
        for fused in (True, False):
            cfg = dataclasses.replace(base, image_size=px,
                                      fused_attention=fused)
            for mode in ("mean", "none"):
                fwd = jax.jit(functools.partial(
                    vision_forward, cfg=cfg, attn_mode=mode))

                def run(p=params, x=im, f=fwd):
                    out = f(p, x)
                    return out["projected"]

                jax.block_until_ready(run())
                r = benchmark(run)
                print(f"px={px} fused={fused!s:5s} mode={mode:4s} "
                      f"{r['ms']:7.2f} ms ({B / (r['ms'] / 1e3):6.1f} img/s)",
                      flush=True)


if __name__ == "__main__":
    main()
