"""Probe: COCO-width PAR diffusion (C=9, 512x640 canvas) with the resident
kernel unlocked by a raised per-kernel scoped-VMEM limit.

At C=9 the resident kernel's ping-pong canvas alone is 15.7 MB, past the
16 MB Mosaic default, so run_group falls back to 20 per-iteration kernel
launches — measured 2x the per-channel cost of the resident path (r4 COCO
ablation: diffusion 47.3 ms at C=9 vs 23.9 ms at C=6). Round 3 verified the
v5e accepts >16 MB scoped VMEM (the N=901 whole-N attention probe at
~20 MB). If the resident kernel at ~21 MB compiles and beats the per-iter
fallback, raising the limit is a pure win for the 8-slot bucket.

Also A/Bs channel-group splitting (5+4) as the fallback-free alternative.

MODE=tiles sweeps the resident kernel's row-tile size with raised VMEM
limits at the production shapes (VOC C=4 384x512, COCO C=6 480x640):
resident_tile_for's 15 MB budget forces tile 8 at COCO (60 slab stagings
per iteration vs VOC's 12 at tile 32) — the probe above confirmed the v5e
runs 24-64 MB scoped-VMEM kernels correctly, so larger tiles are in play.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from excel_tpu.ops.par import _replicate_valid
from excel_tpu.ops.par_pallas import (_diffuse_resident_kernel,
                                      pad_for_diffuse,
                                      par_diffuse_padded_valid,
                                      par_diffuse_valid_resident)
from excel_tpu.utils.profiling import benchmark

B = int(os.environ.get("BENCH_BATCH", "8"))
C = int(os.environ.get("CHANNELS", "9"))
H, W = 512, 640
PAD = 24
K = 48
ITERS = 20


@functools.partial(jax.jit, static_argnames=("offsets", "tile_h",
                                             "limit_mb", "h", "w"))
def resident_vmem(masks_padded, aff, valid_hw, offsets, tile_h: int,
                  limit_mb: int, h: int = None, w: int = None):
    h = H if h is None else h
    w = W if w is None else w
    b, c, hp, wp = masks_padded.shape
    k = aff.shape[1]
    kernel = functools.partial(
        _diffuse_resident_kernel, offsets=tuple(offsets), tile_h=tile_h,
        width=w, pad=PAD, channels=c, hp=hp, wp=wp,
        num_tiles=h // tile_h, num_iter=ITERS, f32_compute=False)
    scratch = [
        pltpu.VMEM((2, c, hp, wp), masks_padded.dtype),
        pltpu.VMEM((c, tile_h + 2 * PAD, wp), masks_padded.dtype),
        pltpu.VMEM((c, tile_h, w), jnp.float32),
        pltpu.VMEM((c, 8, wp), masks_padded.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), masks_padded.dtype),
        grid=(b, ITERS, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, tile_h, w), lambda i, it, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=limit_mb * 1024 * 1024),
        interpret=False,
    )(masks_padded, aff, valid_hw.astype(jnp.int32))


def main():
    from excel_tpu.ops.par import _offsets
    offs = tuple(_offsets((1, 2, 4, 8, 12, 24)))
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    masks = jax.random.uniform(key, (B, C, H, W), jnp.bfloat16)
    aff = jax.nn.softmax(jax.random.normal(
        jax.random.PRNGKey(1), (B, K, H, W)), axis=1).astype(jnp.bfloat16)
    valid = jnp.asarray([[480, 640], [427, 640]] * (B // 2), jnp.int32)
    # XLA pad composition (pad_clamp_fits rejects C=9 at this canvas; the
    # production run_group takes the same fallback)
    mp = jax.jit(lambda m: pad_for_diffuse(
        _replicate_valid(m.astype(jnp.float32), valid).astype(jnp.bfloat16),
        PAD))(masks)

    def per_iter(mp):
        out = jax.lax.fori_loop(
            0, ITERS,
            lambda _, m: par_diffuse_padded_valid(m, aff, valid, offs, H, W),
            mp)
        return out.astype(jnp.float32).sum()

    def groups(mp, sizes):
        outs = []
        c0 = 0
        for g in sizes:
            outs.append(par_diffuse_valid_resident(
                mp[:, c0:c0 + g], aff, valid, offs, H, W, ITERS))
            c0 += g
        return sum(o.astype(jnp.float32).sum() for o in outs)

    def resident(mp, limit):
        return resident_vmem(mp, aff, valid, offs, 8,
                             limit).astype(jnp.float32).sum()

    cands = {
        "per_iter_x20": jax.jit(per_iter),
        "groups_5_4": jax.jit(lambda m: groups(m, (5, 4))),
        "resident_vmem24": jax.jit(lambda m: resident(m, 24)),
        "resident_vmem32": jax.jit(lambda m: resident(m, 32)),
        "resident_vmem64": jax.jit(lambda m: resident(m, 64)),
    }
    only = os.environ.get("VARIANTS")
    if only:
        keep = set(only.split(","))
        cands = {k: v for k, v in cands.items() if k in keep}
    fns = {}
    ref = None
    for name, fn in cands.items():
        try:
            v = float(jax.block_until_ready(fn(mp)))
            if ref is None:
                ref = v
            rel = abs(v - ref) / abs(ref)
            print(f"{name:16s} compiles, sum relerr {rel:.2e}", flush=True)
            fns[name] = fn
        except Exception as e:
            print(f"{name:16s} FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)
    res = {n: [] for n in fns}
    for _ in range(5):
        for n, fn in fns.items():
            res[n].append(benchmark(fn, mp, iters=4)["ms"])
    for n, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{n:16s} {med:7.2f} ms (runs "
              f"{' '.join(f'{t:.2f}' for t in ts)})", flush=True)


def tiles_main():
    """Row-tile sweep at the production shapes with raised VMEM limits.
    Baseline per shape = the tile resident_tile_for picks under the 15 MB
    budget (what production runs today)."""
    from excel_tpu.ops.par import _offsets
    from excel_tpu.ops.par_pallas import resident_tile_for
    offs = tuple(_offsets((1, 2, 4, 8, 12, 24)))
    shapes = {
        "voc_c4_384x512": (16, 4, 384, 512, [375, 500]),
        "coco_c6_480x640": (16, 6, 480, 640, [480, 640]),
    }
    only = os.environ.get("SHAPES")
    if only:
        ks = set(only.split(","))
        shapes = {k: v for k, v in shapes.items() if k in ks}
    for name, (b, c, h, w, vhw) in shapes.items():
        masks = jax.random.uniform(jax.random.PRNGKey(0), (b, c, h, w),
                                   jnp.bfloat16)
        aff = jax.nn.softmax(jax.random.normal(
            jax.random.PRNGKey(1), (b, K, h, w)), axis=1).astype(jnp.bfloat16)
        valid = jnp.asarray([vhw] * b, jnp.int32)
        mp = jax.jit(lambda m, v=valid: pad_for_diffuse(
            _replicate_valid(m.astype(jnp.float32),
                             v).astype(jnp.bfloat16), PAD))(masks)
        base_tile = resident_tile_for(mp.shape, aff.dtype, h, w, K, pad=PAD)
        print(f"\n== {name} (budget tile {base_tile}) ==", flush=True)
        fns, ref = {}, None
        for tile in (8, 16, 32, 64, 96):
            if h % tile:
                continue

            def fn(m, t=tile):
                return resident_vmem(m, aff, valid, offs, t, 40, h=h,
                                     w=w).astype(jnp.float32).sum()

            f = jax.jit(fn)
            try:
                v = float(jax.block_until_ready(f(mp)))
                if ref is None:
                    ref = v
                rel = abs(v - ref) / abs(ref)
                print(f"  tile {tile:3d} compiles, relerr {rel:.2e}",
                      flush=True)
                fns[f"tile{tile}"] = f
            except Exception as e:
                print(f"  tile {tile:3d} FAILED "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
        res = {n: [] for n in fns}
        for _ in range(5):
            for n, f in fns.items():
                res[n].append(benchmark(f, mp, iters=4)["ms"])
        for n, ts in res.items():
            med = sorted(ts)[len(ts) // 2]
            print(f"  {n:8s} {med:7.2f} ms (runs "
                  f"{' '.join(f'{t:.2f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    if os.environ.get("MODE") == "tiles":
        tiles_main()
    else:
        main()
