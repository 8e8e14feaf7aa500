"""Pseudo-label and affinity-label utilities (reference utils/camutils.py).

Fixed-shape, batched equivalents of the reference's per-image loops:
- `lam_to_label`            camutils.py:123-143
- `affinity_label`          camutils.py:438-457 (the SECOND definition — the
                            one that is live; the first at :341-365 is
                            shadowed, so there is NO diagonal ignore)
- `radius_mask`             camutils.py:459-475, vectorized; the reference
                            rebuilds this constant every train iteration
                            (train_voc.py:207-208) — here it is built once.
- `img_box` regions become boolean masks so batches stay fixed-shape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def lam_to_label(cam: jax.Array, cls_label: jax.Array,
                 bkg_thre: float = 0.5, high_thre: float = 0.7,
                 low_thre: float = 0.25, ignore_mid: bool = False,
                 ignore_index: int = 255,
                 box_mask: jax.Array | None = None):
    """cam [B, C_fg, H, W], cls_label [B, C_fg] {0,1}.

    Returns (valid_cam, pseudo_label [B, H, W] int32) with 0 = background,
    1..C_fg = classes, ignore_index outside box_mask / in the mid band.
    """
    valid_cam = cls_label[:, :, None, None] * cam
    cam_value = valid_cam.max(axis=1)
    label = valid_cam.argmax(axis=1).astype(jnp.int32) + 1
    if ignore_mid:
        label = jnp.where(cam_value <= high_thre, ignore_index, label)
        label = jnp.where(cam_value <= low_thre, 0, label)
    else:
        label = jnp.where(cam_value <= bkg_thre, 0, label)
    if box_mask is not None:
        label = jnp.where(box_mask, label, ignore_index)
    return valid_cam, label


def boxes_to_masks(img_box: jax.Array, h: int, w: int) -> jax.Array:
    """[B, 4] (y0, y1, x0, x1) valid-crop boxes -> [B, H, W] bool masks."""
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    b = img_box[:, :, None, None]
    return ((ys >= b[:, 0]) & (ys < b[:, 1]) &
            (xs >= b[:, 2]) & (xs < b[:, 3]))


@functools.lru_cache(maxsize=8)
def radius_mask(h: int, w: int, radius: int) -> np.ndarray:
    """[hw, hw] {0,1}: pairs within a Chebyshev box of `radius`
    (camutils.py:459-475; the clamped-window double loop reduces to
    |dy| <= r and |dx| <= r). Returns host numpy so the cached value is
    trace-independent (it becomes an XLA constant at each use site)."""
    ys, xs = np.mgrid[0:h, 0:w]
    ys, xs = ys.ravel(), xs.ravel()
    ok = ((np.abs(ys[:, None] - ys[None, :]) <= radius)
          & (np.abs(xs[:, None] - xs[None, :]) <= radius))
    return ok.astype(np.float32)


def affinity_label(cam_label: jax.Array, mask: jax.Array | None = None,
                   ignore_index: int = 255,
                   downscale: int = 16) -> jax.Array:
    """Pairwise label-equality affinity targets (camutils.py:438-457).

    cam_label: [B, H, W] int labels. Nearest-downsample by `downscale`,
    aff[i,j] = (l_i == l_j); ignore where the radius mask is 0 or either
    pixel is ignore_index. Returns [B, hw, hw] int32.
    """
    b, h, w = cam_label.shape
    gh, gw = h // downscale, w // downscale
    # torch F.interpolate(mode='nearest') picks floor(i * scale) = i*downscale
    small = cam_label[:, ::downscale, ::downscale][:, :gh, :gw]
    flat = small.reshape(b, -1)
    aff = (flat[:, None, :] == flat[:, :, None]).astype(jnp.int32)
    if mask is not None:
        aff = jnp.where(mask[None] == 0, ignore_index, aff)
    ign = flat == ignore_index
    aff = jnp.where(ign[:, None, :], ignore_index, aff)
    aff = jnp.where(ign[:, :, None], ignore_index, aff)
    return aff


# ---------------------------------------------------------------------------
# refined LAMs + background -> PAR -> pixel pseudo-label
# (reference refine_cams_with_bkg_weclip, affutils.py:55-89,161-174)
# ---------------------------------------------------------------------------

def _minmax_per_map(cams: jax.Array) -> jax.Array:
    """scale_cam_image norm (affutils.py:69-78): x-min over map, /(1e-7+max)."""
    lo = cams.min(axis=(-2, -1), keepdims=True)
    x = cams - lo
    return x / (1e-7 + x.max(axis=(-2, -1), keepdims=True))


def cams_with_background(refined: jax.Array, cls_label: jax.Array,
                         out_hw: tuple[int, int]) -> jax.Array:
    """refined [B, C_fg, h, w] SVC outputs -> [B, 1+C_fg, H, W] score stack.

    Per present class: min-max normalize at grid res, then bilinear-resize to
    out_hw (scale_cam_image order, affutils.py:69-78). Background =
    1 - max over present classes. Absent classes are zeroed.
    """
    b, c, h, w = refined.shape
    H, W = out_hw
    x = _minmax_per_map(refined)
    x = jax.image.resize(x, (b, c, H, W), method="linear")
    x = x * cls_label[:, :, None, None]
    bg = 1.0 - x.max(axis=1, keepdims=True)
    return jnp.concatenate([bg, x], axis=1)


def upscale_to_canvas(x: jax.Array, valid_hw: jax.Array,
                      canvas_hw: tuple[int, int]) -> jax.Array:
    """Bilinearly resize each image's [C, h, w] maps to its own valid extent
    on a fixed [C, H, W] canvas (dynamic per-image output size with a static
    shape — the TPU answer to the reference's per-image F.interpolate).

    x: [B, C, h, w], valid_hw: [B, 2] int32 target extents.
    Values beyond an image's valid extent are edge-continuation garbage;
    mask or replicate-clean them downstream.
    """
    b, c, h, w = x.shape
    H, W = canvas_hw

    def one(img, hw):
        scale = jnp.array([hw[0] / h, hw[1] / w], jnp.float32)
        return jax.image.scale_and_translate(
            img.astype(jnp.float32), (c, H, W), (1, 2), scale,
            jnp.zeros(2, jnp.float32), method="linear", antialias=False)

    return jax.vmap(one)(x, valid_hw)


def upscale_to_canvas_align(x: jax.Array, valid_hw: jax.Array,
                            canvas_hw: tuple[int, int]) -> jax.Array:
    """`upscale_to_canvas` with torch align_corners=True sampling
    (out position o reads input o * (in-1)/(out-1)) — the convention the
    reference PAR uses for its guidance-image resize (utils/PAR.py:67)."""
    b, c, h, w = x.shape
    H, W = canvas_hw

    def one(img, hw):
        # solve scale/translation of jax's half-pixel mapping so that
        # i = o * (in-1)/(out-1): scale = (out-1)/(in-1), t = 0.5*(1-scale)
        sy = (hw[0] - 1.0) / (h - 1.0)
        sx = (hw[1] - 1.0) / (w - 1.0)
        scale = jnp.stack([sy, sx]).astype(jnp.float32)
        trans = 0.5 * (1.0 - scale)
        return jax.image.scale_and_translate(
            img.astype(jnp.float32), (c, H, W), (1, 2), scale, trans,
            method="linear", antialias=False)

    return jax.vmap(one)(x, valid_hw.astype(jnp.float32))


def cams_with_background_canvas(refined: jax.Array, cls_label: jax.Array,
                                valid_hw: jax.Array,
                                canvas_hw: tuple[int, int]) -> jax.Array:
    """`cams_with_background` for per-image output sizes on a fixed canvas
    (the reference's label-resolution eval protocol, affutils.py:161-174)."""
    x = _minmax_per_map(refined)
    x = upscale_to_canvas(x, valid_hw, canvas_hw)
    x = x * cls_label[:, :, None, None]
    bg = 1.0 - x.max(axis=1, keepdims=True)
    return jnp.concatenate([bg, x], axis=1)


def class_slot_index(cls_label: jax.Array, slots: int):
    """Compact per-image present classes into `slots` fixed channel slots.

    The reference never refines absent classes: SVC loops over the image's
    present classes (affutils.py:196-221), PAR and the CRF unaries run on a
    compact [1+n_present, H, W] stack (affutils.py:161-174, dcrf.py:42-68).
    The fixed-shape equivalent keeps bg + the first `slots` present classes
    in ascending class order (identical argmax tie-breaking).

    Returns (idx [B, slots] int32 fg-class indices — present classes first,
    absent-class padding after — and mask [B, slots] float, 1 for present).
    EXACT iff every image has <= `slots` present classes; callers bucket
    `slots` host-side from the batch's max cardinality.
    """
    c = cls_label.shape[1]
    present = (cls_label > 0).astype(jnp.int32)
    key = (1 - present) * c + jnp.arange(c, dtype=jnp.int32)[None]
    idx = jnp.argsort(key, axis=1)[:, :slots].astype(jnp.int32)
    mask = jnp.take_along_axis(cls_label, idx, axis=1)
    return idx, (mask > 0).astype(cls_label.dtype)


def slot_label_to_class(slot_label: jax.Array, idx: jax.Array) -> jax.Array:
    """[B, H, W] argmax over (bg + slots) -> dataset label ids (bg=0,
    fg class i -> i+1).

    Written as a select chain over the (few) slots rather than a per-pixel
    take_along_axis: a [B*H*W] gather lowers to a ~26 ms scalar-unit op on
    TPU at eval canvases; the selects fuse into ~1 ms of VPU work."""
    out = jnp.zeros(slot_label.shape, jnp.int32)
    for s in range(idx.shape[1]):
        cls_id = idx[:, s].astype(jnp.int32) + 1           # [B]
        out = jnp.where(slot_label == s + 1, cls_id[:, None, None], out)
    return out


def argmax_label(cams: jax.Array, cls_label: jax.Array,
                 box_mask: jax.Array | None = None,
                 ignore_index: int = 255) -> jax.Array:
    """[B, 1+C_fg, H, W] scores -> [B, H, W] labels, absent classes excluded.

    Replaces the reference's dynamic valid_key gather (affutils.py:80-89):
    absent class channels are set to -inf before the argmax, which is
    equivalent to argmaxing over the compacted present-class stack and
    mapping back through valid_key.
    """
    full = jnp.concatenate(
        [jnp.ones_like(cls_label[:, :1]), cls_label], axis=1)
    scores = jnp.where(full[:, :, None, None] > 0, cams, -jnp.inf)
    label = scores.argmax(axis=1).astype(jnp.int32)
    if box_mask is not None:
        label = jnp.where(box_mask, label, ignore_index)
    return label
