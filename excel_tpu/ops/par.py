"""PAR — pixel-adaptive refinement (reference utils/PAR.py).

TPU-first redesign: the reference materializes a [B, C, 48, H, W] dilated
neighbor stack per diffusion iteration (PAR.py:39-49,88-91). Each of the 48
"neighbors" is just the image shifted by (dy, dx) in {-d, 0, d}^2 minus the
origin, for
d in dilations, with replicate padding — i.e. clamped-index gathers. We:

* compute the affinity ONCE with a streaming two-pass over the 48 shifts
  (mean/var accumulators, no [*, 48, H, W] image stack for the std),
* run the 20 diffusion iterations as shift-multiply-accumulate over a single
  edge-padded mask tensor, keeping the working set at [B, C, H, W],
* fold the position-affinity softmax (a constant [48] vector) in at trace
  time.

Numerics match the reference: unbiased std (ddof=1), eps 1e-8, w1=0.3,
w2=0.01, fp32 throughout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _offsets(dilations) -> list[tuple[int, int]]:
    offs = []
    for d in dilations:
        for dy in (-d, 0, d):
            for dx in (-d, 0, d):
                if dy == 0 and dx == 0:
                    continue
                offs.append((dy, dx))
    return offs


def _pos_weight(dilations) -> np.ndarray:
    """softmax over the constant position affinity (PAR.py:51-62,83-86).

    Kernel order per dilation: the 8 neighbors in row-major order with
    diagonal entries weighted sqrt(2)*d, axial entries d.
    """
    pos = []
    for d in dilations:
        for i in range(8):
            diag = i in (0, 2, 5, 7)
            pos.append((np.sqrt(2.0) if diag else 1.0) * d)
    pos = np.asarray(pos, dtype=np.float64)
    std = pos.std(ddof=1)
    w1 = 0.3
    aff = -((pos / (std + 1e-8) / w1) ** 2)
    e = np.exp(aff - aff.max())
    return (e / e.sum()).astype(np.float32)


def _shift(padded: jax.Array, dy: int, dx: int, h: int, w: int,
           pad: int) -> jax.Array:
    """Static slice of an edge-padded [..., H+2p, W+2p] tensor."""
    return padded[..., pad + dy:pad + dy + h, pad + dx:pad + dx + w]


def _clamp_valid_padded(mp: jax.Array, valid_hw: jax.Array,
                        pad: int) -> jax.Array:
    """Replicate-valid + edge-pad composition on a padded [B, C, Hp, Wp]
    canvas, written with one-hot contractions + selects (XLA fuses these
    into two streaming passes; index gathers lower to slow scatter ops).

    Padded row r should read row clamp(r - pad, 0, vh - 1) + pad; only rows
    beyond the valid extent actually change, so:
      border_row = Σ_y onehot(pad + vh - 1)[y] * mp[..., y, :]
      mp = where(row >= pad + vh, border_row, mp)      (and cols likewise)
    """
    b, c, hp, wp = mp.shape
    ys = jnp.arange(hp)
    xs = jnp.arange(wp)
    vh = valid_hw[:, 0:1]
    vw = valid_hw[:, 1:2]

    row_onehot = (ys[None] == pad + vh - 1).astype(mp.dtype)     # [B, Hp]
    border_row = jnp.einsum("bchw,bh->bcw", mp, row_onehot)
    mp = jnp.where((ys[None] >= pad + vh)[:, None, :, None],
                   border_row[:, :, None, :], mp)

    col_onehot = (xs[None] == pad + vw - 1).astype(mp.dtype)     # [B, Wp]
    border_col = jnp.einsum("bchw,bw->bch", mp, col_onehot)
    mp = jnp.where((xs[None] >= pad + vw)[:, None, None, :],
                   border_col[:, :, :, None], mp)
    return mp


def _replicate_valid(x: jax.Array, valid_hw: jax.Array) -> jax.Array:
    """Overwrite the region outside each image's valid [h, w] extent with the
    clamped border value (replicate-pad semantics on a fixed canvas).

    x: [B, C, H, W], valid_hw: [B, 2] int32. A canvas whose pad region
    always mirrors the valid border makes fixed-shape PAR *exact* w.r.t. the
    reference's per-size replicate padding (PAR.py:39-49): valid pixels see
    identical neighbor values, so identical affinities and diffusion.

    Written as one-hot contractions + selects: only rows/cols beyond the
    valid extent change, so extracting the border row/col with a one-hot
    einsum and broadcasting it under a mask is exact — and streams on the
    VPU/MXU, where the per-image row+col index gather this replaces cost
    several ms per canvas batch (see CLAUDE.md on TPU gathers).
    """
    _, _, h, w = x.shape
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    vh = valid_hw[:, 0:1]
    vw = valid_hw[:, 1:2]

    row_onehot = (ys[None] == vh - 1).astype(x.dtype)            # [B, H]
    border_row = jnp.einsum("bchw,bh->bcw", x, row_onehot)
    x = jnp.where((ys[None] >= vh)[:, None, :, None],
                  border_row[:, :, None, :], x)

    col_onehot = (xs[None] == vw - 1).astype(x.dtype)            # [B, W]
    border_col = jnp.einsum("bchw,bw->bch", x, col_onehot)
    return jnp.where((xs[None] >= vw)[:, None, None, :],
                     border_col[:, :, :, None], x)


@functools.partial(jax.jit, static_argnames=("dilations", "num_iter",
                                             "w1", "w2", "use_pallas",
                                             "dtype"))
def par_refine(imgs: jax.Array, masks: jax.Array,
               dilations: tuple[int, ...] = (1, 2, 4, 8, 12, 24),
               num_iter: int = 20, w1: float = 0.3,
               w2: float = 0.01, valid_hw: jax.Array | None = None,
               use_pallas: bool | str | None = None,
               dtype: jnp.dtype | None = None) -> jax.Array:
    """Diffuse `masks` along image-appearance affinities.

    imgs:  [B, 3, H, W] denormalized images (same spatial size as masks;
           the reference bilinearly resizes imgs to the mask size first —
           do that on the caller side where sizes differ)
    masks: [B, C, H, W] score maps to refine
    valid_hw: optional [B, 2] per-image valid extents on a padded canvas;
           when given, the pad region is re-replicated from the valid border
           before the affinity pass and after every diffusion step, making
           the result inside the valid region exactly the per-size result.
    use_pallas: None = auto (TPU backend), True/False = force, "interpret"
           = Pallas interpreter mode (CPU tests of the kernel path).
    dtype: optional reduced precision (jnp.bfloat16) for the diffusion
           storage/multiplies — the affinity softmax stays fp32, diffusion
           terms accumulate in fp32. Halves HBM traffic and doubles VPU
           rate; default fp32 matches the reference bit-for-bit.
    Returns [B, C, H, W] float32.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    interpret = use_pallas == "interpret"
    imgs = imgs.astype(jnp.float32)
    masks = masks.astype(jnp.float32)
    h, w = imgs.shape[-2:]
    offs = _offsets(dilations)
    k = len(offs)
    pad = max(max(abs(dy), abs(dx)) for dy, dx in offs)

    if (use_pallas and valid_hw is None and dtype == jnp.bfloat16
            and pad % 8 == 0 and h % 8 == 0 and num_iter >= 1):
        # Full-extent inputs (training crops, crop-res protocols):
        # replicate-valid at [h, w] extents IS plain replicate padding
        # (bit-identical, checked on chip), so route through the fused-valid
        # path below and let its resident kernel + channel-group split
        # handle VMEM pressure. On-chip A/B at the COCO-train shape
        # (B=32, C=9, 320x320 bf16, 20 iters): per-iter no-valid kernel
        # 68.0 ms vs this routing 50.5 ms (-26% — C x halo shrinks the
        # per-iter kernel's row tiles); at the VOC-train shape (C=5) the
        # two are identical within noise (full train step 96.9 vs 97.1 ms,
        # tools/exp_train_ablate.py), so the routing is never worse.
        valid_hw = jnp.broadcast_to(jnp.asarray([h, w], jnp.int32),
                                    (masks.shape[0], 2))

    pallas_aff = (use_pallas and dtype == jnp.bfloat16 and pad % 8 == 0
                  and h % 8 == 0 and imgs.shape[1] == 3)
    # will the fused-valid Pallas diffusion path run? (decides whether the
    # initial canvas clamp happens in XLA here or fused into the pad kernel
    # inside run_group — doing both is a wasted full-canvas pass)
    valid_pallas = bool(use_pallas) and valid_hw is not None \
        and pad % 8 == 0 and dtype == jnp.bfloat16
    # fused pad+clamp kernel needs aligned canvas dims (eval canvases are
    # 128-quantized, engine/evaluate._bucket_of)
    fused_ok = (valid_hw is not None and use_pallas
                and w % 128 == 0 and h % 8 == 0 and pad % 8 == 0)
    if valid_hw is not None and not valid_pallas:
        masks = _replicate_valid(masks, valid_hw)

    if pallas_aff:
        # bf16 fast path: one-pass fused affinity kernel (the XLA
        # formulation below re-reads the padded image ~96x from HBM)
        from .par_pallas import (pad_clamp_fits, pad_for_diffuse,
                                 pad_replicate_valid, par_affinity)
        pos_w = tuple(float(x) for x in _pos_weight(dilations))
        if fused_ok and pad_clamp_fits(imgs.shape, pad, 4):
            ip = pad_replicate_valid(imgs, valid_hw, pad,
                                     interpret=interpret)
        else:
            if valid_hw is not None:
                imgs = _replicate_valid(imgs, valid_hw)
            ip = pad_for_diffuse(imgs, pad)
        aff = par_affinity(ip, tuple(offs), pos_w,
                           h, w, w1=w1, w2=w2, out_dtype=dtype,
                           interpret=interpret)
        masks = masks.astype(dtype)
    else:
        if valid_hw is not None:
            imgs = _replicate_valid(imgs, valid_hw)
        ip = jnp.pad(imgs, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                     mode="edge")

        # pass 1: streaming mean/var of the neighbor stack over the 48 shifts
        s1 = jnp.zeros_like(imgs)
        s2 = jnp.zeros_like(imgs)
        for dy, dx in offs:
            n = _shift(ip, dy, dx, h, w, pad)
            s1 = s1 + n
            s2 = s2 + n * n
        mean = s1 / k
        var = jnp.maximum(s2 / k - mean * mean, 0.0) * (k / (k - 1.0))  # ddof=1
        inv = 1.0 / ((jnp.sqrt(var) + 1e-8) * w1)

        # pass 2: per-shift affinity logits, channel-mean, softmax over shifts
        logits = []
        for dy, dx in offs:
            n = _shift(ip, dy, dx, h, w, pad)
            a = -jnp.square(jnp.abs(n - imgs) * inv)
            logits.append(a.mean(axis=1))                  # [B, H, W]
        logits = jnp.stack(logits, axis=1)                 # [B, K, H, W]
        aff = jax.nn.softmax(logits, axis=1)
        aff = aff + w2 * jnp.asarray(
            _pos_weight(dilations))[None, :, None, None]
        if dtype is not None:
            aff = aff.astype(dtype)
            masks = masks.astype(dtype)
    aff = aff[:, :, None, :, :]                        # [B, K, 1, H, W]

    if valid_pallas:
        # valid-extent canvases (the production eval path): fused
        # replicate-valid clamp, no XLA full-canvas pass between iterations.
        # (valid_pallas is the SAME condition that skipped the initial mask
        # clamp above — the two must stay derived from one flag: the fused
        # path applies the clamp inside the pad kernel instead.)
        from .par_pallas import (pad_clamp_fits, pad_for_diffuse,
                                 pad_replicate_valid,
                                 par_diffuse_padded_valid,
                                 par_diffuse_valid_resident,
                                 resident_tile_for)
        aff_k = aff[:, :, 0]

        def run_group(group: jax.Array) -> jax.Array:
            if fused_ok and pad_clamp_fits(group.shape, pad,
                                           group.dtype.itemsize):
                mp = pad_replicate_valid(group, valid_hw, pad,
                                         interpret=interpret)
            else:
                mp = pad_for_diffuse(_replicate_valid(group, valid_hw), pad)
            if (num_iter >= 1 and resident_tile_for(
                    mp.shape, aff_k.dtype, h, w, k, pad=pad) is not None):
                # whole run in ONE kernel, mask canvas VMEM-resident across
                # iterations (par_pallas._diffuse_resident_kernel)
                mp = par_diffuse_valid_resident(mp, aff_k, valid_hw,
                                                tuple(offs), h, w, num_iter,
                                                interpret=interpret)
            else:
                mp = jax.lax.fori_loop(
                    0, num_iter,
                    lambda _, m: par_diffuse_padded_valid(
                        m, aff_k, valid_hw, tuple(offs), h, w,
                        interpret=interpret),
                    mp)
            return mp[:, :, pad:pad + h, pad:pad + w]

        # channels diffuse independently given aff, so split into the
        # largest groups the RESIDENT kernel can hold (the canvas ping-pongs
        # in VMEM across all iterations). On-chip A/B at COCO width (C=9,
        # 512x640, 20 iters): resident groups 5+4 = 40.0 ms vs 54.3 ms for
        # per-iter kernels on the whole stack, and vs 41.4-42.0 ms for one
        # raised-VMEM-limit resident pass (tools/exp_par_resident_vmem.py)
        # — splitting beats both; aff is re-streamed per group but hides
        # under the VPU issue-rate floor.
        c_total = masks.shape[1]
        hp = h + 2 * pad + 8
        wp = -(-(w + 2 * pad) // 128) * 128

        def fits(cg: int) -> bool:
            return resident_tile_for((masks.shape[0], cg, hp, wp),
                                     aff_k.dtype, h, w, k,
                                     pad=pad) is not None

        cap = c_total
        if num_iter >= 1 and not fits(cap):
            cap = next((cg for cg in range(min(c_total, 32), 0, -1)
                        if fits(cg)), 0)
        if cap == 0:
            cap = 32        # nothing fits resident: per-iter kernels,
            #                 bounded groups keep the slab tiles legal
        if cap >= c_total:
            out = run_group(masks)
        else:
            n_g = -(-c_total // cap)
            base, rem = divmod(c_total, n_g)
            sizes = [base + 1] * rem + [base] * (n_g - rem)  # balanced
            outs, c0 = [], 0
            for g in sizes:
                outs.append(run_group(masks[:, c0:c0 + g]))
                c0 += g
            out = jnp.concatenate(outs, axis=1)
        return out.astype(jnp.float32)
    if use_pallas and valid_hw is None and (pad % 8 == 0
                                            or masks.dtype == jnp.float32):
        # fastest path: the whole loop stays in padded coordinates; the
        # kernel maintains the replicated border itself (no XLA re-pad).
        # fp32 uses the [B,H,C,W] layout (channels in sublanes never shift,
        # dy slices the free leading dim — 5x the CHW kernel); bf16 keeps
        # CHW (Mosaic mishandles sublane-16 broadcasts in the HCW kernel).
        aff_k = aff[:, :, 0]
        interpret = use_pallas == "interpret"
        if masks.dtype == jnp.float32:
            from .par_pallas import pad_for_diffuse_hcw, par_diffuse_padded_hcw
            c = masks.shape[1]
            mp = pad_for_diffuse_hcw(masks, pad)
            mp = jax.lax.fori_loop(
                0, num_iter,
                lambda _, m: par_diffuse_padded_hcw(m, aff_k, tuple(offs),
                                                    h, w,
                                                    interpret=interpret),
                mp)
            return mp[:, pad:pad + h, :c, pad:pad + w].transpose(0, 2, 1, 3)
        from .par_pallas import pad_for_diffuse, par_diffuse_padded
        mp = pad_for_diffuse(masks, pad)
        mp = jax.lax.fori_loop(
            0, num_iter,
            lambda _, m: par_diffuse_padded(m, aff_k, tuple(offs), h, w,
                                            interpret=interpret),
            mp)
        return mp[:, :, pad:pad + h, pad:pad + w].astype(jnp.float32)
    if use_pallas:
        from .par_pallas import pad_for_diffuse, par_diffuse
        aff_k = aff[:, :, 0]                       # [B, K, H, W]
        interpret = use_pallas == "interpret"

        def body(_, m):
            mp = pad_for_diffuse(m, pad)
            acc = par_diffuse(mp, aff_k, tuple(offs), interpret=interpret)
            if valid_hw is not None:
                acc = _replicate_valid(acc, valid_hw)
            return acc
    else:
        def body(_, m):
            mp = jnp.pad(m, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                         mode="edge")
            acc = jnp.zeros_like(m)
            for i, (dy, dx) in enumerate(offs):
                acc = acc + _shift(mp, dy, dx, h, w, pad) * aff[:, i]
            if valid_hw is not None:
                acc = _replicate_valid(acc, valid_hw)
            return acc

    out = jax.lax.fori_loop(0, num_iter, body, masks)
    return out.astype(jnp.float32)
