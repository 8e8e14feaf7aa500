"""Raw VPU multiply-add rate: fp32 vs bf16, mul+add vs separate ops.

PAR's diffusion floor (0.95 ms/iter at the production shape) implies
~3.2 TFLOP/s — about the fp32 VPU peak. If this chip runs PACKED bf16
elementwise at 2x, the PAR kernel is leaving half the VPU on the table
and a layout fix is worth hunting; if bf16 == fp32 rate, the kernel is at
speed-of-light and PAR optimization stops here.

A Pallas kernel does K=64 independent a*x+b steps over a [512, 512] block
(grid over 16 blocks), all operands VMEM-resident — pure VPU, no HBM.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from excel_tpu.utils.profiling import benchmark

H, W, BLOCKS, K = 512, 512, 16, 64


def _kernel(x_ref, a_ref, o_ref, *, k: int, fma: bool):
    x = x_ref[0]
    a = a_ref[0]
    # 8 independent accumulator chains for ILP (a single chain measures
    # VPU latency, not throughput); mirrors PAR's independent offset terms
    lanes = 8
    accs = [x * (1.0 + 0.001 * j) for j in range(lanes)]
    for i in range(k // lanes):
        for j in range(lanes):
            if fma:
                accs[j] = accs[j] * a + x     # mul+add, fusable to fma
            else:
                accs[j] = accs[j] * a         # mul only
    acc = accs[0]
    for j in range(1, lanes):
        acc = acc + accs[j]
    o_ref[0] = acc


def run(dtype, fma, k=K):
    x = jnp.ones((BLOCKS, H, W), dtype) * 0.5
    a = jnp.ones((BLOCKS, H, W), dtype) * 1.0000001

    f = pl.pallas_call(
        functools.partial(_kernel, k=k, fma=fma),
        out_shape=jax.ShapeDtypeStruct((BLOCKS, H, W), dtype),
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    jf = jax.jit(f)
    jax.block_until_ready(jf(x, a))
    ms = benchmark(jf, x, a, iters=8)["ms"]
    ops = BLOCKS * H * W * K * (2 if fma else 1)
    print(f"{dtype.__name__:9s} {'mul+add' if fma else 'mul    '}: "
          f"{ms:7.3f} ms  {ops / (ms / 1e3) / 1e12:6.2f} Tops/s", flush=True)


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        for fma in (True, False):
            run(dtype, fma)


if __name__ == "__main__":
    main()
