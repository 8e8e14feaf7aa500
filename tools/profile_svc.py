"""Sub-part breakdown of the SVC refinement stage on the real TPU.

Times trans_mat, the CCL label propagation, the segment-reduction bbox
extraction, and the final masked matmul separately (bench.py shapes:
B=16, 3 class slots, 20x20 grid, N=401 attention). Identifies which part
of ops/affinity.refine_lams_batch owns its ~9 ms standalone cost.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from excel_tpu.ops.affinity import (_propagate_labels, compute_trans_mat,
                                    refine_lams_batch, scoremap_box_mask)
from excel_tpu.utils.profiling import benchmark

B, C, G, N = 16, 3, 20, 401


def main():
    rng = np.random.default_rng(0)
    lams = jnp.asarray(rng.random((B, C, G * G), np.float32))
    attn = jnp.asarray(rng.random((B, N, N), np.float32))

    @jax.jit
    def full(lams, attn):
        return refine_lams_batch(lams, attn, 0.79, (G, G), attn_layers=6)

    @jax.jit
    def trans_only(attn):
        return jax.vmap(compute_trans_mat)(attn[:, 1:, 1:])

    @jax.jit
    def ccl_only(lams):
        q = jnp.clip(lams.reshape(-1, G, G) * 255.0, 0, 255).astype(jnp.uint8)
        thr = (0.79 * q.max(axis=(1, 2), keepdims=True)
               .astype(jnp.float32)).astype(jnp.int32)
        binary = q.astype(jnp.int32) > thr
        return jax.vmap(_propagate_labels)(binary)

    @jax.jit
    def boxes_only(lams):
        return jax.vmap(jax.vmap(
            lambda m: scoremap_box_mask(m.reshape(G, G), 0.79)))(lams)

    @jax.jit
    def matmul_only(trans, masked):
        return jax.vmap(lambda t, m: (t @ m.T).T)(trans, masked)

    trans = jax.block_until_ready(trans_only(attn))
    jax.block_until_ready(ccl_only(lams))
    jax.block_until_ready(boxes_only(lams))
    jax.block_until_ready(matmul_only(trans, lams))
    jax.block_until_ready(full(lams, attn))

    for name, fn, args in [
        ("trans_mat", trans_only, (attn,)),
        ("ccl_propagate", ccl_only, (lams,)),
        ("box_masks (ccl+segred)", boxes_only, (lams,)),
        ("final matmul", matmul_only, (trans, lams)),
        ("FULL refine_lams_batch", full, (lams, attn)),
    ]:
        r = benchmark(fn, *args, iters=8)
        print(f"{name:26s} {r['ms']:8.2f} ms")


if __name__ == "__main__":
    main()
