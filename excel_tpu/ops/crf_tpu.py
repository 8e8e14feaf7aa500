"""On-TPU dense-CRF approximation: sparse convolutional mean-field.

The reference's CRF (pydensecrf, C++ permutohedral lattice — ours:
excel_tpu/native/densecrf.cpp) runs host-side. This module is the
XLA-friendly fast path named in BASELINE.json's north star: the bilateral +
Gaussian pairwise Potts model evaluated over a SPARSE dilated neighborhood
(convolutional CRF a la Teichmann & Cipolla) instead of the dense
all-pairs kernel. Messages are Σ_k w_k(i) · Q(i + o_k) — structurally the
same shift-multiply-accumulate as PAR diffusion, so it reuses the Pallas
kernel (ops/par_pallas.py) and runs fully inside jit, letting MSC+flip
inference + CRF post-processing stay on device end to end.

Pairwise weights mirror utils/dcrf.py:42-68:
  bi_w  · exp(-|Δxy|²/2σ_xy²  - |ΔRGB|²/2σ_rgb²)   (bilateral)
  pos_w · exp(-|Δxy|²/2σ_pos²)                      (Gaussian)
with symmetric normalization (w_ij / sqrt(n_i n_j), n = filter(1)) and the
mean-field update Q ← softmax(log p + message), matching pydensecrf's
NORMALIZE_SYMMETRIC + Potts convention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CrfConfig

# 8 directions x dilations: spacing grows ~geometrically. Support is capped
# at ±55 px (~0.8 σ_xy of the reference's 67-px bilateral): the Pallas
# diffusion kernel's haloed VMEM tile must fit on-chip, and ConvCRF-style
# truncated supports are known to match dense-CRF quality.
DEFAULT_DILATIONS = (1, 2, 3, 5, 8, 13, 21, 34, 55)


def _offsets(dilations):
    offs = []
    for d in dilations:
        for dy in (-d, 0, d):
            for dx in (-d, 0, d):
                if dy == 0 and dx == 0:
                    continue
                offs.append((dy, dx))
    return offs


def _ring_edges(radii, lo0=None):
    """Annulus bounds per ring: midpoints to the adjacent rings; the
    innermost bound is radii[0]/2 unless `lo0` continues an inner set."""
    rs = sorted(radii)
    edges = [0.5 * (a + b) for a, b in zip(rs[:-1], rs[1:])]
    lo = [rs[0] / 2.0 if lo0 is None else lo0] + edges
    hi = edges + [rs[-1] + (rs[-1] - lo[-1])]
    return rs, lo, hi


def _quadrature_weights(dilations, scale=1.0, lo0=None):
    """Per-offset ring-quadrature weights: offset at dilation d stands in
    for the annulus of pixels between the midpoints to the adjacent rings,
    weight = annulus area / 8 samples. Without these the sparse sum weights
    every ring equally, while the dense kernel's mass grows with ring AREA
    (∝ r dr) — the wide sigma_xy=64-67 bilateral is then badly
    under-sampled at range (measured: the approximation barely responded to
    sigma changes; see tools/exp_crf_agreement.py / PARITY.md).

    scale: ring radius per dilation unit (the coarse level samples at
    stride s, so one coarse offset stands in for an annulus measured in
    FINE pixels). lo0: inner bound in fine pixels (the coarse annuli start
    where the fine support ends)."""
    ds = sorted(dilations)
    rs, lo, hi = _ring_edges([scale * d for d in ds], lo0=lo0)
    area = {d: np.pi * (h * h - l * l) / 8.0
            for d, l, h in zip(ds, lo, hi)}
    return [area[max(abs(dy), abs(dx))]          # ring keyed by its dilation
            for d in dilations for dy in (-d, 0, d) for dx in (-d, 0, d)
            if not (dy == 0 and dx == 0)]        # same order as _offsets


def _support_radius(dilations):
    """Outer edge (in px) of the sparse support's last annulus."""
    return _ring_edges(sorted(dilations))[2][-1]


def _shift(x: jax.Array, dy: int, dx: int, fill: float = 0.0) -> jax.Array:
    """[..., H, W] shifted by (dy, dx), padded with `fill` (out-of-image)."""
    h, w = x.shape[-2:]
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(abs(dy), abs(dy)),
                                              (abs(dx), abs(dx))],
                constant_values=fill)
    return p[..., abs(dy) + dy:abs(dy) + dy + h,
             abs(dx) + dx:abs(dx) + dx + w]


# Coarse long-range level (see crf_meanfield): ring dilations in COARSE
# cells of stride 8 → fine radii 72/96/128/168 px, annuli [≈66, 188] px —
# the ~60% of the σ_xy=67 bilateral's spatial mass the fine support misses.
# Settings swept on the cached protocol cases (2026-08-20): s4 d17-47 ties
# (lam 3.84% vs 4.02%) at 4× the offsets; extending to d27 changes nothing
# (negligible mass past 2.8σ); dilations that OVERLAP the fine support
# (d6-21 → radii from 48 px) are catastrophic (54% disagreement — the
# overlapped annuli double-count kernel mass). Keep s8, start past the
# fine support's outer edge.
COARSE_STRIDE = 8
COARSE_DILATIONS = (9, 12, 16, 21)


@functools.partial(jax.jit,
                   static_argnames=("iters", "dilations", "use_pallas",
                                    "pos_w", "pos_xy_std", "bi_w",
                                    "bi_xy_std", "bi_rgb_std", "msg_dtype",
                                    "quadrature", "coarse_stride",
                                    "coarse_dilations"))
def crf_meanfield(images: jax.Array, probs: jax.Array, iters: int = 10,
                  pos_w: float = 3.0, pos_xy_std: float = 1.0,
                  bi_w: float = 4.0, bi_xy_std: float = 67.0,
                  bi_rgb_std: float = 3.0,
                  dilations: tuple[int, ...] = DEFAULT_DILATIONS,
                  use_pallas: bool | str | None = None,
                  valid_hw: jax.Array | None = None,
                  msg_dtype: jnp.dtype | None = None,
                  quadrature: bool = True,
                  coarse_stride: int = 0,
                  coarse_dilations: tuple[int, ...] = COARSE_DILATIONS
                  ) -> jax.Array:
    """images: [B, H, W, 3] RGB 0-255 (float or uint8), probs: [B, C, H, W]
    softmax probabilities. valid_hw: optional [B, 2] per-image valid extents
    on a padded canvas (pixels beyond them are treated as nonexistent, like
    out-of-image). Returns refined Q [B, C, H, W].

    coarse_stride > 0 adds a LONG-RANGE bilateral level evaluated on an
    s×s-cell coarse grid: the fine support truncates at ≈66 px — only ~38%
    of the dense σ_xy=67 kernel's spatial mass — which was measured to
    diverge up to ~16% argmax from the dense lattice on protocol-regime
    unaries (PARITY.md). Each coarse offset stands in for an annulus of
    fine pixels (quadrature in fine-pixel units continuing where the fine
    annuli end); cell color/mass are valid-masked averages, and the
    symmetric normalization is JOINT across both levels (n_i = fine + the
    upsampled coarse row-sum — one bilateral kernel, evaluated at two
    scales)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    b, c, h, w = probs.shape
    img = images.astype(jnp.float32).transpose(0, 3, 1, 2)      # [B,3,H,W]

    offs = _offsets(dilations)

    # per-offset kernels; out-of-image (or out-of-valid-extent) neighbors
    # get zero weight (the dense model has no pixels there).
    #
    # The build is structured to touch the [B, K, H, W]-sized data as few
    # times as possible — it is the CRF's FIXED cost (~19 ms of the 29 ms
    # C=4 step at 512², measured r5): the spatially-CONSTANT pos kernel is
    # never materialized as a stack (its row-sum is a valid-mask
    # contraction, its normalized form a per-offset scalar times the valid
    # mask), and the bilateral row-sum accumulates inside the build loop
    # instead of a second full-stack pass.
    if valid_hw is None:
        vmap0 = jnp.ones((1, h, w), jnp.float32)
    else:
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        vmap0 = ((ys < valid_hw[:, 0:1, None])
                 & (xs < valid_hw[:, 1:2, None])).astype(jnp.float32)
    qws = (_quadrature_weights(dilations) if quadrature
           else [1.0] * len(offs))
    # per-offset scalar factors: spatial gaussian x annulus quadrature
    bi_c = [float(np.exp(-(dy * dy + dx * dx) / (2.0 * bi_xy_std ** 2)) * q)
            for (dy, dx), q in zip(offs, qws)]
    pos_c = [float(np.exp(-(dy * dy + dx * dx) / (2.0 * pos_xy_std ** 2))
                   * q) for (dy, dx), q in zip(offs, qws)]
    valid_k = [_shift(vmap0, dy, dx) for dy, dx in offs]
    bi_k = []
    n_bi = jnp.zeros_like(img[:, 0])                          # [B, H, W]
    n_pos = jnp.zeros_like(vmap0)                             # [B|1, H, W]
    for (dy, dx), vk, bc, pc in zip(offs, valid_k, bi_c, pos_c):
        nb = _shift(img, dy, dx)
        drgb2 = ((img - nb) ** 2).sum(axis=1)                 # [B, H, W]
        k = bc * jnp.exp(-drgb2 / (2.0 * bi_rgb_std ** 2)) * vk
        bi_k.append(k)
        n_bi = n_bi + k
        n_pos = n_pos + pc * vk

    coarse_msg = None
    if coarse_stride:
        assert quadrature, "the coarse level needs annulus-area weights"
        s = coarse_stride
        h2, w2 = -(-h // s) * s, -(-w // s) * s
        offs_c = _offsets(coarse_dilations)
        quad_c = jnp.asarray(
            _quadrature_weights(coarse_dilations, scale=float(s),
                                lo0=_support_radius(dilations)),
            jnp.float32)[None, :, None, None]

        def cpad(x):
            return jnp.pad(x, [(0, 0)] * (x.ndim - 2)
                           + [(0, h2 - h), (0, w2 - w)])

        def pool(x):
            return x.reshape(*x.shape[:-2], h2 // s, s,
                             w2 // s, s).mean((-3, -1))

        cmask = pool(cpad(vmap0))                             # [B|1, hc, wc]
        denom = jnp.maximum(cmask[:, None], 1e-6)
        cimg = pool(cpad(img * vmap0[:, None])) / denom       # [B, 3, hc, wc]
        # per-cell per-channel color variance for MOMENT-MATCHED cell-pair
        # weights: the dense kernel couples pixel PAIRS, so the coarse
        # sample must be E[exp(-|c_i-c_j|²/2σ²)] over pixels of the two
        # cells — for within-cell variance V that is
        #   ∏_ch sqrt(σ²/(σ²+V_i+V_j)) · exp(-|μ_i-μ_j|²/2(σ²+V_i+V_j)),
        # NOT exp applied to the mean colors. The naive mean-color kernel
        # overestimates long-range affinity ~(1+2V/σ²)^{3/2}-fold in
        # textured cells (σ_rgb=3, V≈75 → ~75×) — measured to wipe thin
        # structures and bleed across texture (tools/exp_crf_agreement.py).
        cvar = jnp.maximum(
            pool(cpad((img * vmap0[:, None]) ** 2)) / denom - cimg ** 2,
            0.0)                                              # [B, 3, hc, wc]
        sig2 = bi_rgb_std ** 2
        wc_k = []
        for dy, dx in offs_c:
            mu_d2 = (cimg - _shift(cimg, dy, dx)) ** 2        # [B, 3, hc, wc]
            s2 = sig2 + cvar + _shift(cvar, dy, dx)
            rgb = (jnp.exp(-(mu_d2 / (2.0 * s2)).sum(axis=1))
                   * jnp.sqrt(jnp.prod(sig2 / s2, axis=1)))
            dxy2 = float(s * s * (dy * dy + dx * dx))
            wc_k.append(np.exp(-dxy2 / (2.0 * bi_xy_std ** 2)) * rgb)
        wc = jnp.stack(wc_k, axis=1) * quad_c                 # [B, Kc, hc, wc]
        nb_cmask = jnp.stack([_shift(cmask, dy, dx) for dy, dx in offs_c],
                             axis=1)
        n_c = (wc * nb_cmask).sum(axis=1)                     # [B, hc, wc]
        n_up = jnp.repeat(jnp.repeat(n_c, s, axis=-2),
                          s, axis=-1)[..., :h, :w]
        n_bi = n_bi + n_up * vmap0

    # pydensecrf NORMALIZE_SYMMETRIC per kernel: k_ij / sqrt(n_i n_j) with
    # n = filter(1), normalized BEFORE the Potts compat weight (after
    # would cancel the compat scale). Assembled in ONE pass over the
    # K-stack: aff_k = bi_w·bi_k·inv_bi_i·inv_bi_j + pos_w·c_k·v_k·
    # inv_pos_i·inv_pos_j (the pos kernel is the constant c_k on valid
    # pairs, so its normalized form needs no stack of its own).
    inv_bi = jax.lax.rsqrt(jnp.maximum(n_bi, 1e-12))
    inv_pos = jax.lax.rsqrt(jnp.maximum(n_pos, 1e-12))
    aff = jnp.stack(
        [bi_w * k * inv_bi * _shift(inv_bi, dy, dx)
         + (pos_w * pc) * vk * inv_pos * _shift(inv_pos, dy, dx)
         for (dy, dx), k, vk, pc in zip(offs, bi_k, valid_k, pos_c)],
        axis=1)

    if coarse_stride:
        invv = inv_bi * vmap0             # inv at fine res, 0 out-of-valid

        def coarse_msg(qq):
            # msg_i = inv_i Σ_k wc_k(cell) · cellmean(inv · Q)(cell + o_k):
            # each coarse sample stands in for annulus-area fine pixels of
            # the SAME jointly-normalized bilateral kernel
            p = pool(cpad(qq * invv[:, None]))                # [B, C, hc, wc]
            acc = jnp.zeros_like(p)
            for k, (dy, dx) in enumerate(offs_c):
                acc = acc + wc[:, k:k + 1] * _shift(p, dy, dx)
            m = jax.image.resize(acc, (*acc.shape[:2], h2, w2), "linear")
            return bi_w * m[..., :h, :w] * inv_bi[:, None]

    unary = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-20))
    q = jax.nn.softmax(unary, axis=1)

    if use_pallas:
        from .par_pallas import pad_for_diffuse, par_diffuse
        pad = max(dilations)
        interpret = use_pallas == "interpret"
        # msg_dtype=bf16: Q and the pairwise weights are stored bf16 in the
        # message pass (accumulation stays f32 inside the kernel, and the
        # softmax(log p + msg) update stays f32 here). Halves the 55-px
        # halo's VMEM slabs and HBM traffic; argmax-level agreement with
        # the f32 path (tested).
        aff_m = aff.astype(msg_dtype) if msg_dtype is not None else aff

        def message(qq):
            # zero-pad: out-of-image neighbor weights are already zero, so
            # the padded values are never used with nonzero weight
            qm = qq.astype(msg_dtype) if msg_dtype is not None else qq
            qp = pad_for_diffuse(qm, pad)
            return par_diffuse(qp, aff_m, tuple(offs),
                               interpret=interpret).astype(jnp.float32)
    else:
        def message(qq):
            acc = jnp.zeros_like(qq)
            for k, (dy, dx) in enumerate(offs):
                acc = acc + aff[:, k:k + 1] * _shift(qq, dy, dx)
            return acc

    def body(_, qq):
        m = message(qq)
        if coarse_msg is not None:
            m = m + coarse_msg(qq)
        return jax.nn.softmax(unary + m, axis=1)

    return jax.lax.fori_loop(0, iters, body, q)


def crf_meanfield_cfg(images, probs, cfg: CrfConfig, **kw):
    kw.setdefault("msg_dtype",
                  jnp.bfloat16 if getattr(cfg, "msg_bf16", False) else None)
    kw.setdefault("coarse_stride",
                  COARSE_STRIDE if getattr(cfg, "long_range", False) else 0)
    return crf_meanfield(images, probs, iters=cfg.iters, pos_w=cfg.pos_w,
                         pos_xy_std=cfg.pos_xy_std, bi_w=cfg.bi_w,
                         bi_xy_std=cfg.bi_xy_std, bi_rgb_std=cfg.bi_rgb_std,
                         **kw)
