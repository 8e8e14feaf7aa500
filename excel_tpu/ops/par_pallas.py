"""Pallas TPU kernel for the PAR diffusion update.

One diffusion iteration computes, for every batch b, channel c, pixel (y,x):

    new[b,c,y,x] = sum_k aff[b,k,y,x] * m_pad[b,c, y+dy_k+P, x+dx_k+P]

with 48 fixed neighbor offsets (8 directions x 6 dilations) and an
edge-replicated pad of P = max dilation. XLA's fusion of this expression
re-reads the affinity stack for every channel (aff does not depend on c),
putting ~13 GB/iteration on HBM at VOC shapes; this kernel tiles the rows,
stages the affinity tile and the haloed mask tile in VMEM once, and reuses
them across all channels — ~0.7 GB/iteration, bandwidth-bound at the
theoretical minimum. The reference burns this cost 20x per training step
(utils/PAR.py:88-91 materializes a [B,C,48,H,W] neighbor stack per
iteration).

The kernel computes ONE iteration; the 20-iteration loop (and the
edge-replicating pad between iterations, a cheap fused XLA op) stays in
ops/par.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _diffuse_kernel(pad_hbm, aff_ref, out_ref, scratch, sem, *,
                    offsets, tile_h: int, width: int, pad: int,
                    channels: int, slab: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # stage the haloed mask tile [C, slab, Wp] into VMEM (slab = tile_h+2P
    # rounded up to the sublane tile of 8 — Mosaic requires aligned DMA)
    row0 = t * tile_h
    copy = pltpu.make_async_copy(
        pad_hbm.at[b, :, pl.ds(row0, slab), :], scratch, sem)
    copy.start()
    copy.wait()

    # chunked accumulation: sum a few offsets in registers, then one ref
    # update per chunk. A single in-place += per offset pays 48 VMEM
    # read-modify-writes of the whole block; a fully unrolled sum makes
    # Mosaic hold all 48 slices on the stack. Chunks of 8 balance both.
    chunk = 8
    for c0 in range(0, len(offsets), chunk):
        part = None
        for k in range(c0, min(c0 + chunk, len(offsets))):
            dy, dx = offsets[k]
            a = aff_ref[0, k]                               # [tile_h, W]
            m = scratch[:, pad + dy:pad + dy + tile_h,
                        pad + dx:pad + dx + width]          # [C, tile_h, W]
            # multiply in the storage dtype (bf16 mode: native VPU rate),
            # accumulate in fp32
            term = (a[None] * m).astype(jnp.float32)
            part = term if part is None else part + term
        if c0 == 0:
            out_ref[0] = part.astype(out_ref.dtype)
        else:
            out_ref[0] += part.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def par_diffuse(masks_padded: jax.Array, aff: jax.Array,
                offsets: tuple[tuple[int, int], ...],
                interpret: bool = False) -> jax.Array:
    """masks_padded: [B, C, H+2P, W+2P] edge-padded masks,
    aff: [B, K, H, W] per-neighbor affinities. Returns [B, C, H, W]."""
    b, c, hp, wp = masks_padded.shape
    _, k, h, w = aff.shape
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    # hp/wp may exceed h/w + 2*pad: the caller pads the lane dimension to a
    # multiple of 128 and adds bottom slack rows so every halo DMA is a
    # whole-row, 8-aligned transfer — Mosaic rejects unaligned slices.
    assert hp >= h + 2 * pad and wp >= w + 2 * pad and k == len(offsets)

    # pick the largest tile height whose VMEM footprint (haloed scratch +
    # double-buffered aff/out blocks) stays under budget; large pads (the
    # conv-CRF path) force small tiles
    wp_bytes = masks_padded.dtype.itemsize
    budget = 12 * 1024 * 1024

    def need_for(cand: int) -> int:
        slab_c = -(-(cand + 2 * pad) // 8) * 8
        return (c * slab_c * wp * wp_bytes            # scratch
                + 2 * k * cand * w * aff.dtype.itemsize   # aff blocks
                + 2 * c * cand * w * wp_bytes         # out blocks
                + 8 * c * cand * w * 4)               # live fp32 chunk terms

    tile_h = 8
    for cand in (64, 32, 16, 8):
        if h % cand:
            continue
        if need_for(cand) <= budget:
            tile_h = cand
            break
    # Even the minimum tile can overflow the 16 MB scoped-VMEM default when
    # C x halo is large (the 81-class conv-CRF at 640-px canvas allocates
    # 17.2 MB at tile 8 — a real compile failure, caught by the r4 COCO MSC
    # ablation). The v5e runs 24-64 MB scoped-VMEM kernels correctly and
    # bit-exactly (probed in tools/exp_par_resident_vmem.py), so raise the
    # per-kernel limit to the (over-estimating) model need when tile 8
    # still misses the default budget.
    vmem_limit = None
    if tile_h == 8 and need_for(8) > budget:
        vmem_limit = min(need_for(8) + 2 * 1024 * 1024, 128 * 1024 * 1024)

    slab = -(-(tile_h + 2 * pad) // 8) * 8
    # the last tile's DMA reads rows [h - tile_h, h - tile_h + slab); the
    # caller (pad_for_diffuse) bottom-pads up to 8 slack rows beyond h + 2p
    assert hp >= h - tile_h + slab, (hp, h, tile_h, slab)
    kernel = functools.partial(
        _diffuse_kernel, offsets=tuple(offsets), tile_h=tile_h, width=w,
        pad=pad, channels=c, slab=slab)
    grid = (b, h // tile_h)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), masks_padded.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # padded masks (HBM)
            pl.BlockSpec((1, k, tile_h, w), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tile_h, w), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, slab, wp), masks_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
                         if vmem_limit is not None else None),
        interpret=interpret,
    )(masks_padded, aff)


def _pick_padded_tile(h: int, c: int, w: int, wp: int, pad: int, k: int,
                      it: int, ait: int, f32_compute: bool = False) -> int:
    """Largest row tile whose worst-case VMEM footprint fits the 16 MB
    scoped budget.

    Mosaic keeps ~every offset's shifted slice live across the chunked
    accumulation, not just the current chunk's (measured on-chip: the fp32
    [16,5,384,512] diffusion at tile 32 allocates 19.3 MB ≈ fixed buffers
    + ~36 live [c,tile,w] slices — the old 4-slice model under-budgeted
    and the fp32 eval path failed to compile at production shapes), so
    the slice term scales with the offset count. In f32-compute mode the
    slab is additionally mirrored to a fp32 scratch and the live slices
    are fp32 regardless of the storage dtype."""
    st = 4 if f32_compute else it                     # live-slice itemsize
    slab32 = (c * 4) if (f32_compute and it != 4) else 0
    for cand in (64, 32, 16, 8):
        if h % cand:
            continue
        need = (c * (cand + 2 * pad) * wp * it        # haloed in scratch
                + (cand + 2 * pad) * wp * slab32      # fp32 slab mirror
                + c * cand * w * 4                    # fp32 accumulator
                + c * cand * wp * it                  # out scratch
                + c * (pad + 8 + 8) * wp * it         # border (+clamp row)
                + 2 * k * cand * w * ait              # double-buffered aff
                + 36 * c * cand * w * st)             # live shifted slices
        if need <= 16 * 1024 * 1024:
            return cand
    return 8


def _accumulate_offsets(src_ref, aff_ref, acc_ref, *, offsets, tile_h: int,
                        width: int, pad: int, f32: bool):
    """Chunked 48-offset multiply-accumulate into the fp32 acc_ref.

    Chunked through a scratch ref (a pure SSA chain makes Mosaic
    stack-allocate every intermediate). f32=True promotes src/aff to fp32
    and runs the loop as fp32 FMA. MEASURED SLOWER on-chip (v5e,
    production shape: 2.18 vs 1.54 ms/iter): Mosaic runs the bf16
    multiply-add packed 2-per-lane, and the loop floor is VMEM load-issue
    rate, so doubling element width doubles the bottleneck. Kept as an
    option because it is ~3x tighter numerically (max err 9.8e-4 vs
    3.0e-3 against the fp32 reference over 20 iters) — useful if a
    future consumer needs accuracy over speed. f32=False keeps the
    storage-dtype arithmetic (fp32 storage path and the production bf16
    path)."""
    chunk = 8
    storage_f32 = src_ref.dtype == jnp.float32
    for c0 in range(0, len(offsets), chunk):
        part = None
        for k in range(c0, min(c0 + chunk, len(offsets))):
            dy, dx = offsets[k]
            a = aff_ref[0, k]
            if f32 and not storage_f32:
                a = a.astype(jnp.float32)
            m = src_ref[:, pad + dy:pad + dy + tile_h,
                        pad + dx:pad + dx + width]
            # multiply in storage dtype (bf16 packed 2-per-lane), accumulate
            # every term in fp32: the loop floor is VMEM load-issue rate, so
            # the per-term converts are free, and bf16-summed chunks would
            # quietly loosen the production path's numerics (ADVICE r2)
            term = (a[None] * m).astype(jnp.float32)
            part = term if part is None else part + term
        if c0 == 0:
            acc_ref[:] = part
        else:
            acc_ref[:] += part


def _diffuse_padded_kernel(src_any, aff_ref, out_any, *scratch, offsets,
                           tile_h: int, width: int, pad: int, channels: int,
                           slab: int, wp: int, num_tiles: int,
                           bottom_rows: int, f32_compute: bool):
    """Padded-in/padded-out diffusion step: writes the edge-replicated
    border itself, so the iteration loop never re-pads in XLA."""
    if f32_compute:
        (in_scratch, slab32, acc_ref, out_scratch, border_scratch,
         sem_in, sem_out, sem_border) = scratch
    else:
        (in_scratch, acc_ref, out_scratch, border_scratch,
         sem_in, sem_out, sem_border) = scratch
    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * tile_h

    copy_in = pltpu.make_async_copy(
        src_any.at[b, :, pl.ds(row0, slab), :], in_scratch, sem_in)
    copy_in.start()
    copy_in.wait()

    if f32_compute:
        # one up-front promotion of the slab; every offset then reads the
        # fp32 mirror (48 overlapping slices share the converted elements)
        slab32[:] = in_scratch[:].astype(jnp.float32)
        src = slab32
    else:
        src = in_scratch
    _accumulate_offsets(src, aff_ref, acc_ref, offsets=offsets,
                        tile_h=tile_h, width=width, pad=pad,
                        f32=f32_compute)

    # replicate columns into the pad region (rows of this tile)
    acc = acc_ref[:]
    left = jnp.broadcast_to(acc[:, :, :1], (channels, tile_h, pad))
    right = jnp.broadcast_to(acc[:, :, width - 1:width],
                             (channels, tile_h, wp - pad - width))
    out_scratch[:] = jnp.concatenate([left, acc, right],
                                     axis=2).astype(out_scratch.dtype)
    copy_out = pltpu.make_async_copy(
        out_scratch, out_any.at[b, :, pl.ds(pad + row0, tile_h), :], sem_out)
    copy_out.start()
    copy_out.wait()

    @pl.when(t == 0)
    def _():
        border_scratch[:] = jnp.broadcast_to(
            out_scratch[:, :1, :], (channels, bottom_rows, wp)
        ).astype(border_scratch.dtype)
        cp = pltpu.make_async_copy(
            border_scratch.at[:, :pad, :],
            out_any.at[b, :, pl.ds(0, pad), :], sem_border)
        cp.start()
        cp.wait()

    @pl.when(t == num_tiles - 1)
    def _():
        h = tile_h * num_tiles
        border_scratch[:] = jnp.broadcast_to(
            out_scratch[:, tile_h - 1:tile_h, :], (channels, bottom_rows, wp)
        ).astype(border_scratch.dtype)
        cp = pltpu.make_async_copy(
            border_scratch,
            out_any.at[b, :, pl.ds(pad + h, bottom_rows), :], sem_border)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("offsets", "h", "w",
                                             "interpret", "tile_h",
                                             "f32_compute"))
def par_diffuse_padded(masks_padded: jax.Array, aff: jax.Array,
                       offsets: tuple[tuple[int, int], ...], h: int, w: int,
                       interpret: bool = False,
                       tile_h: int | None = None,
                       f32_compute: bool = False) -> jax.Array:
    """One diffusion step in padded coordinates: [B, C, Hp, Wp] -> same,
    with the edge-replicated border maintained by the kernel. Hp/Wp must
    come from `pad_for_diffuse` (8 bottom slack rows, 128-aligned lanes).
    tile_h overrides the automatic row-tile choice (must divide h).
    f32_compute: with bf16 storage, run the inner loop in fp32
    (tighter rounding, ~40% slower — see _accumulate_offsets)."""
    b, c, hp, wp = masks_padded.shape
    k = aff.shape[1]
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    assert hp == h + 2 * pad + 8 and wp >= w + 2 * pad and k == len(offsets)
    assert pad % 8 == 0, "padded-loop kernel needs an 8-aligned pad"

    f32_compute = f32_compute and masks_padded.dtype != jnp.float32
    if tile_h is None:
        # larger tiles amortize the per-invocation prologue and shrink the
        # halo re-read fraction (slab/tile); compacted channel stacks
        # (class slots) make 32/64 fit the VMEM budget
        tile_h = _pick_padded_tile(h, c, w, wp, pad, k,
                                   masks_padded.dtype.itemsize,
                                   aff.dtype.itemsize,
                                   f32_compute=f32_compute)
    assert h % tile_h == 0, (h, tile_h)
    slab = tile_h + 2 * pad                       # 8-aligned (pad % 8 == 0)
    bottom_rows = pad + 8

    kernel = functools.partial(
        _diffuse_padded_kernel, offsets=tuple(offsets), tile_h=tile_h,
        width=w, pad=pad, channels=c, slab=slab, wp=wp,
        num_tiles=h // tile_h, bottom_rows=bottom_rows,
        f32_compute=f32_compute)
    scratch = [pltpu.VMEM((c, slab, wp), masks_padded.dtype)]
    if f32_compute:
        scratch.append(pltpu.VMEM((c, slab, wp), jnp.float32))
    scratch += [
        pltpu.VMEM((c, tile_h, w), jnp.float32),
        pltpu.VMEM((c, tile_h, wp), masks_padded.dtype),
        pltpu.VMEM((c, bottom_rows, wp), masks_padded.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), masks_padded.dtype),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, tile_h, w), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(masks_padded, aff)


def _diffuse_padded_valid_kernel(src_any, aff_ref, valid_ref, out_any,
                                 *scratch, offsets, tile_h: int,
                                 width: int, pad: int, channels: int,
                                 slab: int, wp: int, num_tiles: int,
                                 bottom_rows: int, f32_compute: bool):
    """Padded diffusion step with the per-image valid-extent clamp fused in.

    Replaces the per-iteration XLA pass of ops/par._clamp_valid_padded
    (a full-canvas read+write per iteration): interior cols >= vw take the
    col-(vw-1) value, interior rows >= vh take the row-(vh-1) value. The
    border row is extracted with a one-hot contraction in the tile that
    contains it and carried to later tiles in a VMEM scratch — the TPU grid
    runs row tiles of one batch element sequentially on the core, so the
    scratch written at tile floor((vh-1)/tile_h) is visible to every later
    tile of the same image."""
    if f32_compute:
        (in_scratch, slab32, acc_ref, out_scratch, border_row,
         border_scratch, sem_in, sem_out, sem_border) = scratch
    else:
        (in_scratch, acc_ref, out_scratch, border_row,
         border_scratch, sem_in, sem_out, sem_border) = scratch
    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * tile_h
    vh = valid_ref[b, 0]
    vw = valid_ref[b, 1]

    copy_in = pltpu.make_async_copy(
        src_any.at[b, :, pl.ds(row0, slab), :], in_scratch, sem_in)
    copy_in.start()
    copy_in.wait()

    if f32_compute:
        slab32[:] = in_scratch[:].astype(jnp.float32)
        src = slab32
    else:
        src = in_scratch
    _accumulate_offsets(src, aff_ref, acc_ref, offsets=offsets,
                        tile_h=tile_h, width=width, pad=pad,
                        f32=f32_compute)

    # column clamp at the valid width (fp32, same rounding as the interior)
    acc = acc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 2)
    bcol = jnp.sum(jnp.where(lane == vw - 1, acc, 0.0), axis=2,
                   keepdims=True)
    acc = jnp.where(lane >= vw, bcol, acc)

    # replicate into the left/right pad (right pad == bcol via col w-1)
    left = jnp.broadcast_to(acc[:, :, :1], (channels, tile_h, pad))
    right = jnp.broadcast_to(acc[:, :, width - 1:width],
                             (channels, tile_h, wp - pad - width))
    row_full = jnp.concatenate([left, acc, right],
                               axis=2).astype(out_scratch.dtype)

    # save the border row when this tile contains it (before any use)
    @pl.when((vh - 1 >= row0) & (vh - 1 < row0 + tile_h))
    def _():
        sub = jax.lax.broadcasted_iota(jnp.int32, row_full.shape, 1)
        hot = (sub == vh - 1 - row0).astype(jnp.float32)
        border_row[:] = jnp.broadcast_to(
            jnp.sum(row_full.astype(jnp.float32) * hot, axis=1,
                    keepdims=True),
            border_row.shape).astype(border_row.dtype)

    # row clamp: output rows at interior index >= vh take the border row
    sub = jax.lax.broadcasted_iota(jnp.int32, row_full.shape, 1)
    out_scratch[:] = jnp.where(row0 + sub >= vh, border_row[:, :1, :],
                               row_full)

    copy_out = pltpu.make_async_copy(
        out_scratch, out_any.at[b, :, pl.ds(pad + row0, tile_h), :], sem_out)
    copy_out.start()
    copy_out.wait()

    @pl.when(t == 0)
    def _():
        # top pad replicates interior row 0 (always valid: images are
        # anchored top-left on the canvas)
        border_scratch[:] = jnp.broadcast_to(
            out_scratch[:, :1, :], (channels, bottom_rows, wp)
        ).astype(border_scratch.dtype)
        cp = pltpu.make_async_copy(
            border_scratch.at[:, :pad, :],
            out_any.at[b, :, pl.ds(0, pad), :], sem_border)
        cp.start()
        cp.wait()

    @pl.when(t == num_tiles - 1)
    def _():
        # bottom pad rows are all >= vh: broadcast the border row
        h = tile_h * num_tiles
        border_scratch[:] = jnp.broadcast_to(
            border_row[:, :1, :], (channels, bottom_rows, wp)
        ).astype(border_scratch.dtype)
        cp = pltpu.make_async_copy(
            border_scratch,
            out_any.at[b, :, pl.ds(pad + h, bottom_rows), :], sem_border)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("offsets", "h", "w",
                                             "interpret", "tile_h",
                                             "f32_compute"))
def par_diffuse_padded_valid(masks_padded: jax.Array, aff: jax.Array,
                             valid_hw: jax.Array,
                             offsets: tuple[tuple[int, int], ...], h: int,
                             w: int, interpret: bool = False,
                             tile_h: int | None = None,
                             f32_compute: bool = False) -> jax.Array:
    """One padded diffusion step with fused valid-extent clamping.
    masks_padded: [B, C, Hp, Wp] from `pad_for_diffuse` of a
    replicate-valid canvas; valid_hw: [B, 2] int32 (read from SMEM).
    f32_compute: fp32 inner loop over bf16 storage (tighter rounding,
    ~40% slower — see _accumulate_offsets)."""
    b, c, hp, wp = masks_padded.shape
    k = aff.shape[1]
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    assert hp == h + 2 * pad + 8 and wp >= w + 2 * pad and k == len(offsets)
    assert pad % 8 == 0, "padded-loop kernel needs an 8-aligned pad"

    f32_compute = f32_compute and masks_padded.dtype != jnp.float32
    if tile_h is None:
        tile_h = _pick_padded_tile(h, c, w, wp, pad, k,
                                   masks_padded.dtype.itemsize,
                                   aff.dtype.itemsize,
                                   f32_compute=f32_compute)
    assert h % tile_h == 0, (h, tile_h)
    slab = tile_h + 2 * pad
    bottom_rows = pad + 8

    kernel = functools.partial(
        _diffuse_padded_valid_kernel, offsets=tuple(offsets), tile_h=tile_h,
        width=w, pad=pad, channels=c, slab=slab, wp=wp,
        num_tiles=h // tile_h, bottom_rows=bottom_rows,
        f32_compute=f32_compute)
    scratch = [pltpu.VMEM((c, slab, wp), masks_padded.dtype)]
    if f32_compute:
        scratch.append(pltpu.VMEM((c, slab, wp), jnp.float32))
    scratch += [
        pltpu.VMEM((c, tile_h, w), jnp.float32),
        pltpu.VMEM((c, tile_h, wp), masks_padded.dtype),
        pltpu.VMEM((c, 8, wp), masks_padded.dtype),
        pltpu.VMEM((c, bottom_rows, wp), masks_padded.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), masks_padded.dtype),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, tile_h, w), lambda i, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(masks_padded, aff, valid_hw.astype(jnp.int32))


def _diffuse_hcw_kernel(src_any, aff_ref, out_any, in_scratch, acc_ref,
                        out_scratch, border_scratch, sem_in, sem_out,
                        sem_border, *, offsets, tile_h: int, width: int,
                        pad: int, channels: int, slab: int, wp: int,
                        num_tiles: int):
    """[B, H, C, W]-layout diffusion step. Rows (H) are the LEADING dim:
    dy shifts slice it for free and halo DMAs need no sublane alignment;
    channels sit in sublanes and never shift; only the 13 distinct dx
    values touch lanes."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * tile_h

    copy_in = pltpu.make_async_copy(
        src_any.at[b, pl.ds(row0, slab), :, :], in_scratch, sem_in)
    copy_in.start()
    copy_in.wait()

    chunk = 8
    for c0 in range(0, len(offsets), chunk):
        part = None
        for kk in range(c0, min(c0 + chunk, len(offsets))):
            dy, dx = offsets[kk]
            # aff block carries a singleton sublane dim ([th, 1, W]):
            # reshaping a 2D bf16 tile to add one is an unsupported Mosaic
            # shape cast, but broadcasting a loaded [th, 1, W] is fine
            a = aff_ref[0, kk]                             # [tile_h, 1, W]
            m = in_scratch[pad + dy:pad + dy + tile_h, :,
                           pad + dx:pad + dx + width]      # [th, C, W]
            term = (a * m).astype(jnp.float32)
            part = term if part is None else part + term
        if c0 == 0:
            acc_ref[:] = part
        else:
            acc_ref[:] += part

    acc = acc_ref[:]
    left = jnp.broadcast_to(acc[:, :, :1], (tile_h, channels, pad))
    right = jnp.broadcast_to(acc[:, :, width - 1:width],
                             (tile_h, channels, wp - pad - width))
    out_scratch[:] = jnp.concatenate([left, acc, right],
                                     axis=2).astype(out_scratch.dtype)
    copy_out = pltpu.make_async_copy(
        out_scratch, out_any.at[b, pl.ds(pad + row0, tile_h), :, :], sem_out)
    copy_out.start()
    copy_out.wait()

    @pl.when(t == 0)
    def _():
        border_scratch[:] = jnp.broadcast_to(
            out_scratch[:1], (pad, channels, wp)).astype(border_scratch.dtype)
        cp = pltpu.make_async_copy(
            border_scratch, out_any.at[b, pl.ds(0, pad), :, :], sem_border)
        cp.start()
        cp.wait()

    @pl.when(t == num_tiles - 1)
    def _():
        h = tile_h * num_tiles
        border_scratch[:] = jnp.broadcast_to(
            out_scratch[tile_h - 1:tile_h],
            (pad, channels, wp)).astype(border_scratch.dtype)
        cp = pltpu.make_async_copy(
            border_scratch, out_any.at[b, pl.ds(pad + h, pad), :, :],
            sem_border)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("offsets", "h", "w",
                                             "interpret"))
def par_diffuse_padded_hcw(masks_padded: jax.Array, aff: jax.Array,
                           offsets: tuple[tuple[int, int], ...], h: int,
                           w: int, interpret: bool = False) -> jax.Array:
    """One padded diffusion step in [B, Hp, C, Wp] layout (pad_for_diffuse_hcw).
    aff: [B, K, H, W]."""
    b, hp, c, wp = masks_padded.shape
    k = aff.shape[1]
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    assert hp == h + 2 * pad and wp >= w + 2 * pad and k == len(offsets)

    it = masks_padded.dtype.itemsize
    tile_h = 8
    for cand in (64, 32, 16, 8):
        if h % cand == 0 and (c * (cand + 2 * pad) * wp * it
                              + c * cand * w * 4
                              + c * cand * wp * it
                              + c * pad * wp * it
                              + 2 * k * cand * w * aff.dtype.itemsize
                              + 8 * c * cand * w * 4   # live fp32 chunk terms
                              ) <= 10 * 1024 * 1024:
            tile_h = cand
            break
    slab = tile_h + 2 * pad

    kernel = functools.partial(
        _diffuse_hcw_kernel, offsets=tuple(offsets), tile_h=tile_h, width=w,
        pad=pad, channels=c, slab=slab, wp=wp, num_tiles=h // tile_h)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, c, wp), masks_padded.dtype),
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, tile_h, 1, w),
                         lambda i, t: (i, 0, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((slab, c, wp), masks_padded.dtype),
            pltpu.VMEM((tile_h, c, w), jnp.float32),
            pltpu.VMEM((tile_h, c, wp), masks_padded.dtype),
            pltpu.VMEM((pad, c, wp), masks_padded.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(masks_padded, aff[:, :, :, None, :])


def pad_for_diffuse_hcw(m: jax.Array, pad: int) -> jax.Array:
    """[B, C, H, W] -> edge-padded [B, H+2p, C8, Wp]: lane dim 128-aligned,
    channel (sublane) dim padded to a multiple of 8 — Mosaic requires
    aligned DMA extents on both tiled dims."""
    mp = jnp.pad(m, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    extra_w = (-mp.shape[-1]) % 128
    sublane = {4: 8, 2: 16, 1: 32}[m.dtype.itemsize]
    extra_c = (-mp.shape[1]) % sublane
    mp = jnp.pad(mp, ((0, 0), (0, extra_c), (0, 0), (0, extra_w)))
    return mp.transpose(0, 2, 1, 3)


def pad_for_diffuse(m: jax.Array, pad: int) -> jax.Array:
    """Edge-pad rows/cols by `pad`, then zero-pad the lane (last) dim to a
    multiple of 128 and add 8 bottom slack rows, both for aligned halo DMA
    (the zero regions are staged but never read). [B,C,H,W] ->
    [B,C,H+2p+8,roundup128]."""
    mp = jnp.pad(m, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    extra = (-mp.shape[-1]) % 128
    mp = jnp.pad(mp, ((0, 0), (0, 0), (0, 8), (0, extra)))
    return mp


def _diffuse_resident_kernel(src_any, aff_ref, valid_ref, out_any,
                             *scratch, offsets, tile_h: int, width: int,
                             pad: int, channels: int, hp: int, wp: int,
                             num_tiles: int, num_iter: int,
                             f32_compute: bool):
    """ALL diffusion iterations in one kernel: the padded mask canvas lives
    in a VMEM ping-pong buffer for the whole run, so the only per-iteration
    HBM traffic is the affinity stream (which cannot fit VMEM). Replaces
    20 kernel launches + per-tile HBM slab reads/writes of the per-
    iteration kernels. The haloed tile is staged slab-by-slab with a
    VMEM->VMEM DMA (Mosaic needs static sublane offsets for the +-dy
    neighbor slices, and the DMA row start t*tile_h is 8-aligned where
    t*tile_h + dy is not). Valid-extent clamping is fused exactly as in
    _diffuse_padded_valid_kernel (same one-hot border-row carry, so results
    are bit-identical to iterating that kernel)."""
    if f32_compute:
        (mbuf, slab_ref, slab32, acc_ref, brow_ref,
         sem_in, sem_slab, sem_out) = scratch
    else:
        (mbuf, slab_ref, acc_ref, brow_ref,
         sem_in, sem_slab, sem_out) = scratch
    b = pl.program_id(0)
    it = pl.program_id(1)
    t = pl.program_id(2)
    h = tile_h * num_tiles
    vh = valid_ref[b, 0]
    vw = valid_ref[b, 1]
    src = it % 2
    dst = 1 - src

    @pl.when((it == 0) & (t == 0))
    def _():
        cp = pltpu.make_async_copy(src_any.at[b], mbuf.at[0], sem_in)
        cp.start()
        cp.wait()

    row0 = t * tile_h
    slab = tile_h + 2 * pad
    cp = pltpu.make_async_copy(
        mbuf.at[src, :, pl.ds(row0, slab), :], slab_ref, sem_slab)
    cp.start()
    cp.wait()

    if f32_compute:
        slab32[:] = slab_ref[:].astype(jnp.float32)
        src_slab = slab32
    else:
        src_slab = slab_ref
    _accumulate_offsets(src_slab, aff_ref, acc_ref, offsets=offsets,
                        tile_h=tile_h, width=width, pad=pad,
                        f32=f32_compute)

    # column clamp at the valid width (fp32, same rounding as the interior)
    acc = acc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 2)
    bcol = jnp.sum(jnp.where(lane == vw - 1, acc, 0.0), axis=2,
                   keepdims=True)
    acc = jnp.where(lane >= vw, bcol, acc)

    left = jnp.broadcast_to(acc[:, :, :1], (channels, tile_h, pad))
    right = jnp.broadcast_to(acc[:, :, width - 1:width],
                             (channels, tile_h, wp - pad - width))
    row_full = jnp.concatenate([left, acc, right],
                               axis=2).astype(mbuf.dtype)

    # save the border row when this tile contains it (before any use)
    @pl.when((vh - 1 >= row0) & (vh - 1 < row0 + tile_h))
    def _():
        sub = jax.lax.broadcasted_iota(jnp.int32, row_full.shape, 1)
        hot = (sub == vh - 1 - row0).astype(jnp.float32)
        brow_ref[:] = jnp.broadcast_to(
            jnp.sum(row_full.astype(jnp.float32) * hot, axis=1,
                    keepdims=True), brow_ref.shape).astype(brow_ref.dtype)

    # row clamp: interior rows >= vh take the border row
    sub = jax.lax.broadcasted_iota(jnp.int32, row_full.shape, 1)
    out_tile = jnp.where(row0 + sub >= vh, brow_ref[:, :1, :], row_full)
    mbuf[pl.ds(dst, 1), :, pl.ds(pad + row0, tile_h), :] = out_tile[None]

    @pl.when(t == 0)
    def _():
        # top pad replicates interior row 0 (always valid)
        mbuf[pl.ds(dst, 1), :, pl.ds(0, pad), :] = jnp.broadcast_to(
            out_tile[:, :1, :], (channels, pad, wp)).astype(mbuf.dtype)[None]

    @pl.when(t == num_tiles - 1)
    def _():
        # bottom pad + slack rows are all >= vh: broadcast the border row
        mbuf[pl.ds(dst, 1), :, pl.ds(pad + h, hp - pad - h), :] = (
            jnp.broadcast_to(brow_ref[:, :1, :],
                             (channels, hp - pad - h, wp))
            .astype(mbuf.dtype)[None])

        @pl.when(it == num_iter - 1)
        def _():
            cp = pltpu.make_async_copy(mbuf.at[dst], out_any.at[b], sem_out)
            cp.start()
            cp.wait()


@functools.partial(jax.jit, static_argnames=("offsets", "h", "w", "num_iter",
                                             "interpret", "tile_h",
                                             "f32_compute"))
def par_diffuse_valid_resident(masks_padded: jax.Array, aff: jax.Array,
                               valid_hw: jax.Array,
                               offsets: tuple[tuple[int, int], ...], h: int,
                               w: int, num_iter: int,
                               interpret: bool = False,
                               tile_h: int | None = None,
                               f32_compute: bool = False) -> jax.Array:
    """All `num_iter` fused-valid diffusion steps in one pallas_call (see
    _diffuse_resident_kernel). masks_padded: [B, C, Hp, Wp] from
    `pad_for_diffuse`; returns the same shape. Use
    `resident_tile_for(...)` to check VMEM feasibility first."""
    b, c, hp, wp = masks_padded.shape
    k = aff.shape[1]
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    assert hp == h + 2 * pad + 8 and wp >= w + 2 * pad and k == len(offsets)
    assert pad % 8 == 0 and num_iter >= 1

    f32_compute = f32_compute and masks_padded.dtype != jnp.float32
    if tile_h is None:
        tile_h = resident_tile_for(masks_padded.shape, aff.dtype, h, w, k,
                                   f32_compute=f32_compute, pad=pad)
        assert tile_h is not None, "does not fit VMEM; use the per-iter kernel"

    kernel = functools.partial(
        _diffuse_resident_kernel, offsets=tuple(offsets), tile_h=tile_h,
        width=w, pad=pad, channels=c, hp=hp, wp=wp,
        num_tiles=h // tile_h, num_iter=num_iter, f32_compute=f32_compute)
    scratch = [
        pltpu.VMEM((2, c, hp, wp), masks_padded.dtype),
        pltpu.VMEM((c, tile_h + 2 * pad, wp), masks_padded.dtype),
    ]
    if f32_compute:
        scratch.append(pltpu.VMEM((c, tile_h + 2 * pad, wp), jnp.float32))
    scratch += [
        pltpu.VMEM((c, tile_h, w), jnp.float32),
        pltpu.VMEM((c, 8, wp), masks_padded.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), masks_padded.dtype),
        grid=(b, num_iter, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k, tile_h, w), lambda i, it, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(masks_padded, aff, valid_hw.astype(jnp.int32))


def resident_tile_for(mask_shape, aff_dtype, h: int, w: int,
                      k: int, f32_compute: bool = False,
                      pad: int = 24) -> int | None:
    """Largest row tile for the resident kernel that fits the VMEM budget,
    or None when the ping-pong canvas itself is too big (large C / canvas —
    fall back to the per-iteration kernel). Uses the same empirical
    ~all-offsets live-slice model as _pick_padded_tile. `pad` is the halo
    (max abs offset); callers that know the real dilation set should pass
    it (the default matches the production dilations [1,2,4,8,12,24])."""
    b, c, hp, wp = mask_shape
    it = jnp.dtype(jnp.bfloat16).itemsize    # resident path is bf16-only
    ait = jnp.dtype(aff_dtype).itemsize
    st = 4 if f32_compute else it
    budget = 15 * 1024 * 1024
    pad_guess = pad
    for cand in (64, 32, 16, 8):
        if h % cand:
            continue
        slab32 = (c * (cand + 2 * pad_guess) * wp * 4) if f32_compute else 0
        need = (2 * c * hp * wp * it              # ping-pong canvas
                + c * (cand + 2 * pad_guess) * wp * it   # haloed slab stage
                + slab32                          # fp32 slab mirror
                + 2 * k * cand * w * ait          # aff double buffer
                + c * cand * w * 4                # fp32 acc
                + c * 8 * wp * it                 # border row
                + 36 * c * cand * w * st)         # live shifted slices
        if need <= budget:
            return cand
    return None


def _pad_clamp_kernel(x_any, valid_ref, out_any, in_buf, out_buf,
                      sem_in, sem_out, *, pad: int, h: int, w: int,
                      hp: int, wp: int, channels: int):
    """Whole-image fused `pad_for_diffuse(_replicate_valid(x))`: one HBM
    read + one HBM write instead of the 4+ full-canvas XLA passes of the
    composition (border einsums, selects, two pads — measured ~1.8-2.4 ms
    per tensor at eval shapes vs ~0.3 ms here)."""
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(x_any.at[b], in_buf, sem_in)
    cp.start()
    cp.wait()
    vh = valid_ref[b, 0]
    vw = valid_ref[b, 1]

    x = in_buf[:]                                        # [C, H, W]
    # valid-extent clamp (same one-hot border extraction as
    # ops/par._replicate_valid — bit-identical selection semantics)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    bcol = jnp.sum(jnp.where(lane == vw - 1, x, 0.0), axis=2, keepdims=True)
    x = jnp.where(lane >= vw, bcol, x)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    brow = jnp.sum(jnp.where(sub == vh - 1, x, 0.0), axis=1, keepdims=True)
    x = jnp.where(sub >= vh, brow, x)

    # edge pads. Right slack cols / bottom slack rows (the 128-lane and
    # 8-row alignment regions pad_for_diffuse zero-fills) replicate the
    # border instead — those regions are staged but never read by the
    # affinity/diffusion kernels (offsets stay within +-pad).
    left = jnp.broadcast_to(x[:, :, :1], (channels, h, pad))
    right = jnp.broadcast_to(x[:, :, w - 1:w], (channels, h, wp - pad - w))
    xr = jnp.concatenate([left, x, right], axis=2)       # [C, H, Wp]
    top = jnp.broadcast_to(xr[:, :1, :], (channels, pad, wp))
    bot = jnp.broadcast_to(xr[:, h - 1:h, :], (channels, hp - pad - h, wp))
    out_buf[:] = jnp.concatenate([top, xr, bot], axis=1)

    cp = pltpu.make_async_copy(out_buf, out_any.at[b], sem_out)
    cp.start()
    cp.wait()


def pad_clamp_fits(shape, pad: int, itemsize: int) -> bool:
    """Whole-image staging VMEM check for `pad_replicate_valid`."""
    b, c, h, w = shape
    hp = h + 2 * pad + 8
    wp = -(-(w + 2 * pad) // 128) * 128
    need = c * h * w * itemsize + c * hp * wp * itemsize
    # concat/select temporaries roughly double the live set
    return 2 * need <= 13 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("pad", "interpret"))
def pad_replicate_valid(x: jax.Array, valid_hw: jax.Array, pad: int,
                        interpret: bool = False) -> jax.Array:
    """Fused `pad_for_diffuse(_replicate_valid(x, valid_hw), pad)`.

    x: [B, C, H, W] with W a multiple of 128 and H a multiple of 8 (the
    eval canvases are 128-quantized, engine/evaluate._bucket_of). Returns
    [B, C, H+2p+8, roundup128(W+2p)] — identical to the XLA composition
    everywhere the diffusion/affinity kernels read (the alignment slack
    regions carry replicated border values instead of zeros)."""
    b, c, h, w = x.shape
    assert w % 128 == 0 and h % 8 == 0 and pad % 8 == 0
    hp = h + 2 * pad + 8
    wp = -(-(w + 2 * pad) // 128) * 128
    kernel = functools.partial(_pad_clamp_kernel, pad=pad, h=h, w=w,
                               hp=hp, wp=wp, channels=c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((c, h, w), x.dtype),
            pltpu.VMEM((c, hp, wp), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, valid_hw.astype(jnp.int32))


def _affinity_kernel(img_any, out_ref, img_scratch, s1_ref, s2_ref,
                     logit_ref, sem_img, *, offsets, pos_w, tile_h: int,
                     width: int, pad: int, slab: int, w1: float, w2: float):
    """Appearance-affinity pass of PAR (utils/PAR.py:64-86) in one VMEM
    round-trip: neighbor mean/var (streaming over the 48 shifts), per-shift
    channel-mean logits, softmax over shifts, + w2 * position softmax.
    The XLA formulation re-reads the padded image ~96 times from HBM; here
    the haloed slab is staged once per row tile."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * tile_h

    cp = pltpu.make_async_copy(
        img_any.at[b, :, pl.ds(row0, slab), :], img_scratch, sem_img)
    cp.start()
    cp.wait()

    center = img_scratch[:, pad:pad + tile_h, pad:pad + width]  # [3,tile,W]

    # pass A: streaming neighbor mean/var (chunked accumulation through
    # scratch refs — a pure SSA chain makes Mosaic stack-allocate)
    k_n = len(offsets)
    chunk = 8
    for c0 in range(0, k_n, chunk):
        p1 = p2 = None
        for k in range(c0, min(c0 + chunk, k_n)):
            dy, dx = offsets[k]
            n = img_scratch[:, pad + dy:pad + dy + tile_h,
                            pad + dx:pad + dx + width]
            p1 = n if p1 is None else p1 + n
            p2 = n * n if p2 is None else p2 + n * n
        if c0 == 0:
            s1_ref[:] = p1
            s2_ref[:] = p2
        else:
            s1_ref[:] += p1
            s2_ref[:] += p2

    kf = float(k_n)
    mean = s1_ref[:] / kf
    var = jnp.maximum(s2_ref[:] / kf - mean * mean, 0.0) * (kf / (kf - 1.0))
    inv = 1.0 / ((jnp.sqrt(var) + 1e-8) * w1)                   # [3,tile,W]

    # pass B: per-shift logits = channel mean of -((n - x) * inv)^2
    for k in range(k_n):
        dy, dx = offsets[k]
        n = img_scratch[:, pad + dy:pad + dy + tile_h,
                        pad + dx:pad + dx + width]
        d = (n - center) * inv
        logit_ref[k] = -jnp.mean(d * d, axis=0)

    # softmax over the shift axis + constant position-affinity term
    # (pos_w enters as per-k Python floats — a captured [K] jnp constant is
    # rejected by pallas_call)
    logits = logit_ref[:]                                       # [K,tile,W]
    mx = jnp.max(logits, axis=0)                                # [tile,W]
    e = jnp.exp(logits - mx[None])
    logit_ref[:] = e                                            # reuse as e
    inv_s = 1.0 / jnp.sum(e, axis=0)                            # [tile,W]
    for k in range(k_n):
        out_ref[0, k] = (logit_ref[k] * inv_s
                         + (w2 * pos_w[k])).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "pos_w", "h", "w",
                                             "w1", "w2", "out_dtype",
                                             "interpret", "tile_h"))
def par_affinity(img_padded: jax.Array,
                 offsets: tuple[tuple[int, int], ...],
                 pos_w: tuple[float, ...], h: int, w: int,
                 w1: float = 0.3, w2: float = 0.01,
                 out_dtype=jnp.bfloat16, interpret: bool = False,
                 tile_h: int | None = None) -> jax.Array:
    """PAR affinity from a `pad_for_diffuse`-padded image.

    img_padded: [B, 3, H+2p+8, Wp] fp32 (edge-padded, lane-aligned).
    Returns aff [B, K, H, W] in out_dtype. h must be a multiple of 8.
    """
    b, c, hp, wp = img_padded.shape
    k = len(offsets)
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    assert c == 3 and hp == h + 2 * pad + 8 and wp >= w + 2 * pad
    assert pad % 8 == 0 and h % 8 == 0

    if tile_h is None:
        tile_h = 8
        # tile 48 measured 18% faster than 32 at VOC eval shapes (W=512);
        # the 13MB budget admits it there and rejects it at COCO's W=640
        # (where it would exceed the 16MB scoped-vmem limit)
        for cand in (48, 32, 16, 8):
            if h % cand == 0 and (3 * (cand + 2 * pad) * wp * 4   # slab
                                  + 2 * 3 * cand * w * 4          # s1/s2
                                  + k * cand * w * 4              # logits
                                  + 2 * k * cand * w * jnp.dtype(out_dtype).itemsize
                                  + 4 * 3 * cand * w * 4          # chunk regs
                                  ) <= 13 * 1024 * 1024:
                tile_h = cand
                break
    assert h % tile_h == 0
    slab = tile_h + 2 * pad

    kernel = functools.partial(
        _affinity_kernel, offsets=tuple(offsets), pos_w=tuple(pos_w),
        tile_h=tile_h, width=w, pad=pad, slab=slab, w1=w1, w2=w2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, k, h, w), out_dtype),
        grid=(b, h // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, k, tile_h, w), lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, slab, wp), jnp.float32),
            pltpu.VMEM((3, tile_h, w), jnp.float32),
            pltpu.VMEM((3, tile_h, w), jnp.float32),
            pltpu.VMEM((k, tile_h, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_padded)
