"""Evaluation protocols: in-training validation, LAM eval, MSC+flip seg eval.

Reference protocols replicated on fixed-shape canvases (SURVEY.md §3.4/3.5):

- in-training val   engine/validatation_engine.py:11-46 — resize to 320²,
  full forward, pseudo branch (caa 0.75, seg_attn=attn_pred) + seg branch,
  both scored at label resolution.
- LAM eval          tools/infer_lam.py:63-128 — caa 0.79; training-free
  (encoder only, no seg_attn) or trained (flip-fused LVC-calibrated LAMs +
  seg_attn).
- MSC+flip seg      tools/infer_seg_voc.py:47-101 — scales ×320 with
  horizontal-flip averaging (scale 1.0 keeps only the non-flipped logits —
  reference quirk at :71), mean over scales, argmax at label resolution.

The reference's per-image dynamic shapes become per-image valid extents on a
static [canvas, canvas] grid: cams/logits are upscaled to each image's true
size with dynamic-scale `scale_and_translate`, PAR runs with exact
replicate-border semantics (ops/par.py), and the confusion matrix ignores
the padded region because the padded GT is 255. One compiled program per
(batch, scale) — no recompiles across an entire sweep, images stream through
in batches instead of the reference's batch-1 loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExcelConfig
from ..models.clip import encode_image
from ..models.excel import compute_lams, excel_forward
from ..ops.affinity import refine_lams_batch
from ..ops.labels import (argmax_label, cams_with_background_canvas,
                          upscale_to_canvas, upscale_to_canvas_align)
from ..ops.par import par_refine
from ..utils.metrics import (init_hist, scores_from_hist, update_hist)
from .pipeline import normalize_images
from ..data.loader import prefetch_iter
from ..data.resize import resize_bilinear
from ..parallel.distributed import global_sum_host


# ---------------------------------------------------------------------------
# device steps
# ---------------------------------------------------------------------------

def _flip_fused_calibrated_lams(params, images, text_attr, cfg):
    """cure_attr_map_flip (camutils.py:8-30): calibrated LAMs for [x, flip x],
    elementwise max after unflipping, per-map min-max normalize."""
    b = images.shape[0]
    grid = images.shape[1] // cfg.clip.patch_size
    cat = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)  # W axis
    out = excel_forward(params, cat, text_attr, cfg)
    lams = excel_forward(params, cat, text_attr, cfg, ex_feats=out.fused)
    maps = lams.transpose(0, 2, 1).reshape(2 * b, -1, grid, grid)
    fused = jnp.maximum(maps[:b], maps[b:, :, :, ::-1])
    fused = fused - fused.min(axis=(-2, -1), keepdims=True)
    fused = fused / (fused.max(axis=(-2, -1), keepdims=True) + 1e-5)
    lams = fused.reshape(b, -1, grid * grid).transpose(0, 2, 1)
    # attention/attn_pred of the non-flipped half drive SVC
    return lams, out.attn_weights[:, :b], out.attn_pred[:b]


def _pseudo_on_canvas(lams, attn_weights, guide_images, cls_label, valid_hw,
                      cfg: ExcelConfig, canvas: tuple[int, int], caa: float,
                      seg_attn, class_slots: int | None = None):
    """SVC refine -> +bg upscaled to valid extents -> PAR -> argmax labels.
    Returns (labels, normed pre-PAR cams [B, 1+C, *canvas]) — the second
    output is the reference's `normed_attr_maps` (refine_cams_with_bkg_weclip
    returns the bg+normed stack BEFORE PAR, affutils.py:161-174; that is
    what its CAM dumps and crf_post spills consume,
    tools/infer_lam.py:98,118).

    class_slots: compact to bg + `class_slots` present-class channels
    before SVC/upscale/PAR (the reference's own cost structure — it only
    ever refines present classes, affutils.py:161-221). EXACT when every
    image in the batch has <= class_slots present classes; callers bucket
    it from the batch's label cardinality. The returned cams are then the
    compacted [B, 1+slots, *canvas] stack (present classes ascending —
    class_slot_index order, matching the reference's cls_lst).
    """
    b, hw, c = lams.shape
    grid = int(round(hw ** 0.5))
    lams = lams.transpose(0, 2, 1)                        # [B, C, hw]
    if class_slots is not None and class_slots < c:
        from ..ops.labels import class_slot_index, slot_label_to_class
        idx, smask = class_slot_index(cls_label, class_slots)
        lams = jnp.take_along_axis(lams, idx[:, :, None], axis=1)
        cls_sel = smask
    else:
        class_slots = None
        cls_sel = cls_label
    refined = refine_lams_batch(
        lams, attn_weights, caa, (grid, grid),
        attn_layers=cfg.refine.attn_layers, seg_attn=seg_attn)
    normed = cams_with_background_canvas(
        refined.reshape(b, -1, grid, grid), cls_sel, valid_hw, canvas)
    # the reference PAR resizes its guidance with align_corners=True
    # (utils/PAR.py:67) — a different convention from every other resize
    guide = upscale_to_canvas_align(guide_images, valid_hw, canvas)
    cams = par_refine(guide, normed,
                      dilations=tuple(cfg.refine.par_dilations),
                      num_iter=cfg.refine.par_iters, valid_hw=valid_hw,
                      dtype=jnp.bfloat16 if cfg.refine.par_bf16 else None)
    if class_slots is not None:
        slot = argmax_label(cams, cls_sel,
                            ignore_index=cfg.refine.ignore_index)
        return slot_label_to_class(slot, idx), normed
    labels = argmax_label(cams, cls_label,
                          ignore_index=cfg.refine.ignore_index)
    return labels, normed


@functools.partial(jax.jit,
                   static_argnames=("cfg", "canvas", "mode", "return_cams",
                                    "class_slots"))
def lam_eval_step(params: dict, images_u8, cls_label, valid_hw, text_attr,
                  cfg: ExcelConfig, canvas: tuple[int, int],
                  mode: str = "training_free", return_cams: bool = False,
                  class_slots: int | None = None):
    """Pseudo-labels at label resolution for one resized batch.

    images_u8: [B, 320, 320, 3] float32 (host-resized, unnormalized 0-255)
    valid_hw:  [B, 2] original label extents.  mode: 'training_free' |
    'trained' (infer_lam.py:80-93).
    Returns labels [B, canvas, canvas] int32 (255 outside valid extents is
    up to the GT; prediction itself covers the canvas). return_cams=True
    additionally returns the normed PRE-PAR bg+class stack (the reference's
    `normed_attr_maps` — what its CAM dumps and crf_post spills consume,
    tools/infer_lam.py:98,118); compacted to [B, 1+slots, ...] under
    class_slots.
    """
    images = normalize_images(images_u8)
    nchw = images.transpose(0, 3, 1, 2)
    if mode == "training_free":
        # no seg_attn -> SVC consumes only the block-MEAN attention; the
        # encoder accumulates it in-kernel instead of stacking 6 [B,N,N]s
        from .pipeline import attn_mode_for
        out = encode_image(params["clip"], images, cfg.clip,
                           attn_mode=attn_mode_for(cfg))
        lams = compute_lams(out, text_attr, cfg.num_fg)
        attn_w, seg_attn = out["attn"], None
        caa = cfg.refine.caa_threshold
    elif mode == "trained":
        lams, attn_w, seg_attn = _flip_fused_calibrated_lams(
            params, images, text_attr, cfg)
        caa = cfg.refine.caa_threshold
    else:
        raise ValueError(mode)
    # PAR guidance: the NORMALIZED resized input (infer_lam.py:94,
    # validatation_engine.py:35 pass `inputs`, not denormalized ones)
    labels, cams = _pseudo_on_canvas(lams, attn_w, nchw, cls_label, valid_hw,
                                     cfg, canvas, caa, seg_attn,
                                     class_slots=class_slots)
    return (labels, cams) if return_cams else labels


@functools.partial(jax.jit, static_argnames=("cfg", "canvas", "mode",
                                             "class_slots"),
                   donate_argnums=(0,))
def lam_eval_hist_step(hist, params: dict, images_u8, cls_label, gt_labels,
                       valid_hw, text_attr, cfg: ExcelConfig,
                       canvas: tuple[int, int], mode: str = "training_free",
                       class_slots: int | None = None):
    """lam_eval_step fused with the confusion-hist update: one compiled
    program per bucket whose only output is the [C, C] hist — predictions
    are consumed on device (they'd otherwise cross a program boundary per
    batch, a 12+ MB device->host stream on tunneled-TPU setups and an HBM
    round-trip everywhere)."""
    preds = lam_eval_step(params, images_u8, cls_label, valid_hw, text_attr,
                          cfg, canvas, mode, class_slots=class_slots)
    return update_hist(hist, gt_labels, preds, cfg.num_classes)


@functools.partial(jax.jit, static_argnames=("cfg", "class_slots"))
def lam_crf_refine(cams, canvas_images_u8, cls_label, valid_hw,
                   cfg: ExcelConfig, class_slots: int | None = None):
    """On-device DenseCRF branch of the reference's LAM crf_post protocol
    (tools/infer_lam.py:198-225): conv mean-field (ops/crf_tpu.py) over the
    pre-PAR normed bg+present stack against the canvas-resolution image,
    slot argmax mapped back to class ids — all inside the program, no
    per-image npy spill or host lattice. Approximate vs the host `--crf`
    pass (PARITY.md protocol-regime 'lam' bounds; enable
    cfg.crf.long_range for the 10.96→4.02% variant); the host pass stays
    the exact-form path. [B, 1+K, H, W] cams -> [B, H, W] class ids."""
    from ..ops.crf_tpu import crf_meanfield_cfg
    from ..ops.labels import class_slot_index, slot_label_to_class
    q = crf_meanfield_cfg(canvas_images_u8, cams, cfg.crf, valid_hw=valid_hw)
    slot = jnp.argmax(q, axis=1).astype(jnp.int32)
    if class_slots is None:
        return slot                  # full stack: channel s IS class id s
    idx, _ = class_slot_index(cls_label, class_slots)
    return slot_label_to_class(slot, idx)


@functools.partial(jax.jit, static_argnames=("cfg", "canvas", "mode",
                                             "class_slots"),
                   donate_argnums=(0, 1))
def lam_crf_hist_step(hist, crf_hist, params: dict, images_u8, cls_label,
                      gt_labels, valid_hw, canvas_images_u8, text_attr,
                      cfg: ExcelConfig, canvas: tuple[int, int],
                      mode: str = "training_free",
                      class_slots: int | None = None):
    """lam_eval_hist_step fused with the on-device CRF branch: one program
    whose only outputs are the raw and CRF [C, C] hists (the reference's
    seg_score + crf_seg_score pair, tools/infer_lam.py:163-166)."""
    preds, cams = lam_eval_step(params, images_u8, cls_label, valid_hw,
                                text_attr, cfg, canvas, mode,
                                return_cams=True, class_slots=class_slots)
    hist = update_hist(hist, gt_labels, preds, cfg.num_classes)
    crf_preds = lam_crf_refine(cams, canvas_images_u8, cls_label, valid_hw,
                               cfg, class_slots=class_slots)
    crf_hist = update_hist(crf_hist, gt_labels, crf_preds, cfg.num_classes)
    return hist, crf_hist


@functools.partial(jax.jit, static_argnames=("cfg", "canvas",
                                             "class_slots"))
def val_step(params: dict, images_u8, cls_label, valid_hw, text_attr,
             cfg: ExcelConfig, canvas: tuple[int, int],
             class_slots: int | None = None):
    """In-training validation: (pseudo labels, seg preds) on the canvas."""
    images = normalize_images(images_u8)
    out = excel_forward(params, images, text_attr, cfg)
    pseudos, _ = _pseudo_on_canvas(
        out.lams, out.attn_weights, images.transpose(0, 3, 1, 2), cls_label,
        valid_hw, cfg, canvas, cfg.refine.val_caa_threshold, out.attn_pred,
        class_slots=class_slots)
    b, hw, c = out.segs.shape
    grid = int(round(hw ** 0.5))
    seg_grid = out.segs.transpose(0, 2, 1).reshape(b, c, grid, grid)
    seg_canvas = upscale_to_canvas(seg_grid, valid_hw, canvas)
    return pseudos, jnp.argmax(seg_canvas, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def seg_grid_logits(params: dict, images_u8, text_attr, cfg: ExcelConfig):
    """Forward -> decoder logits on the token grid, [B, C, g, g].
    Compiled once per static input size (one per MSC scale). Encoder
    attention outputs are skipped (attn_mode="none") — the seg branch never
    reads them."""
    images = normalize_images(images_u8)
    out = excel_forward(params, images, text_attr, cfg, attn_mode="none")
    b, hw, c = out.segs.shape
    grid = int(round(hw ** 0.5))
    return out.segs.transpose(0, 2, 1).reshape(b, c, grid, grid)


@functools.partial(jax.jit, static_argnames=("cfg", "canvas", "keep_flip"))
def msc_accumulate(params: dict, images_u8, valid_hw, text_attr,
                   cfg: ExcelConfig, canvas: tuple[int, int], acc,
                   keep_flip: bool = True):
    """One MSC scale: forward [x, flip x], unflip, average (or, at scale 1.0,
    forward only x — the reference computes the flipped half and DISCARDS it,
    infer_seg_voc.py:71; the kept result is identical without it, so we skip
    ~1/8 of all MSC encoder compute), upscale to valid extents, add into the
    canvas accumulator [B, C, canvas, canvas]."""
    b = images_u8.shape[0]
    if keep_flip:
        cat = jnp.concatenate([images_u8, images_u8[:, :, ::-1, :]], axis=0)
        logits = seg_grid_logits(params, cat, text_attr, cfg)
        fused = (logits[:b] + logits[b:, :, :, ::-1]) / 2.0
    else:
        fused = seg_grid_logits(params, images_u8, text_attr, cfg)
    return acc + upscale_to_canvas(fused, valid_hw, canvas)


@functools.partial(jax.jit, static_argnames=())
def canvas_argmax(acc):
    return jnp.argmax(acc, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfgs", "canvas", "keep_flips",
                                             "use_crf", "return_outputs"),
                   donate_argnums=(0,))
def msc_hist_step(hist, params: dict, scale_images: tuple, gt_labels,
                  valid_hw, text_attr, cfgs: tuple,
                  canvas: tuple[int, int], keep_flips: tuple,
                  canvas_images=None, use_crf: bool = False,
                  return_outputs: bool = False):
    """All MSC scales + flip fusion + (optional on-TPU CRF) + argmax + hist
    update in ONE compiled program: the [B, C, canvas] accumulator and the
    predictions stay on device instead of crossing a program boundary per
    scale (a 100+ MB device<->host stream per batch on tunneled setups).

    return_outputs=True additionally returns (pre-CRF summed logits, preds)
    for per-image dumps — the single spill point of the sweep. The logits
    are ALWAYS pre-CRF (the reference saves raw fused logits and runs its
    host CRF on those, tools/infer_seg_voc.py:90-91,103-174; saving the
    on-TPU CRF's Q as "logits" would double-CRF downstream)."""
    cfg0 = cfgs[0]
    b = scale_images[0].shape[0]
    acc = jnp.zeros((b, cfg0.num_classes, *canvas), jnp.float32)
    for imgs, c, kf in zip(scale_images, cfgs, keep_flips):
        acc = msc_accumulate(params, imgs, valid_hw, text_attr, c, canvas,
                             acc, keep_flip=kf)
    logits = acc
    if use_crf:
        from ..ops.crf_tpu import crf_meanfield_cfg
        probs = jax.nn.softmax(acc, axis=1)
        acc = crf_meanfield_cfg(canvas_images, probs, cfg0.crf,
                                valid_hw=valid_hw)
    preds = canvas_argmax(acc)
    hist = update_hist(hist, gt_labels, preds, cfg0.num_classes)
    return (hist, logits, preds) if return_outputs else hist


@functools.partial(jax.jit, static_argnames=("cfg", "canvas", "class_slots"),
                   donate_argnums=(0, 1))
def val_hist_step(hist_p, hist_s, params: dict, images_u8, cls_label,
                  gt_labels, valid_hw, text_attr, cfg: ExcelConfig,
                  canvas: tuple[int, int], class_slots: int | None = None):
    """In-training validation step fused with both confusion-hist updates
    (pseudo + seg branch); outputs are two [C, C] hists."""
    pseudos, segs = val_step(params, images_u8, cls_label, valid_hw,
                             text_attr, cfg, canvas,
                             class_slots=class_slots)
    return (update_hist(hist_p, gt_labels, pseudos, cfg.num_classes),
            update_hist(hist_s, gt_labels, segs, cfg.num_classes))


# ---------------------------------------------------------------------------
# host sweeps
# ---------------------------------------------------------------------------

def _prep_batch(samples: list[dict], resize: int, canvas: tuple[int, int],
                with_canvas_images: bool = False):
    """Full-size eval samples -> (images [B,r,r,3] f32, cls [B,C], labels
    [B,*canvas] 255-padded, valid_hw [B,2][, canvas_images])."""
    ch, cw = canvas
    images, labels, cls, valid, canv = [], [], [], [], []
    for s in samples:
        img = resize_bilinear(s["image"], (resize, resize))
        lab = np.full((ch, cw), 255, np.int32)
        h, w = s["label"].shape
        h, w = min(h, ch), min(w, cw)
        lab[:h, :w] = s["label"][:h, :w]
        images.append(img)
        labels.append(lab)
        cls.append(s["cls_label"])
        valid.append((h, w))
        if with_canvas_images:
            ci = np.zeros((ch, cw, 3), np.uint8)
            ci[:h, :w] = s["image"][:h, :w]
            canv.append(ci)
    out = (np.stack(images), np.stack(cls).astype(np.float32),
           np.stack(labels), np.asarray(valid, np.int32))
    return out + (np.stack(canv),) if with_canvas_images else out


def _bucket_of(sample, pad: int, q: int = 128) -> tuple[int, int]:
    """Quantized canvas bucket for one sample's label extent, capped at
    the configured eval pad (SURVEY.md §7: bucketed eval resolutions — a
    500x375 image on a 512x384 canvas instead of 512x512 skips ~27% of the
    PAR/CRF compute). Width quantizes to `q`=128 (the Pallas kernels' lane
    alignment); height only needs 8-row sublane alignment, so it quantizes
    to 32 — COCO's ubiquitous 480-row images get a 480x640 canvas instead
    of 512x640 (-6.7% of all per-pixel work) and VOC's 333-row portraits a
    352-row one. Finer height buckets trade a few extra compiles for
    strictly smaller canvases."""
    h, w = sample["label"].shape
    hq = min(q, 32)
    return (min(-(-h // hq) * hq, pad), min(-(-w // q) * q, pad))


def _bucketed_batches(dataset, batch_size: int, pad: int,
                      slot_buckets=None, num_fg: int | None = None):
    """Group samples into canvas buckets; yield (canvas_hw, samples) with
    full batches (remainders padded with all-255-GT blanks).

    slot_buckets/num_fg: additionally group by each image's class-slot
    bucket, so batches are slot-homogeneous. The batch's compiled
    specialization is sized by its MAX per-image class count — without this
    one 6-class image drags a whole batch of 1-2-class images onto the
    big-slot program (PAR diffusion cost is ~linear in 1+slots channels,
    the dominant eval cost at COCO widths). Exact: the confusion hist is
    order-invariant and padding blanks carry all-255 GT."""
    buckets: dict = {}
    for i in range(len(dataset)):
        s = dataset[i]
        key = _bucket_of(s, pad)
        if slot_buckets is not None:
            need = int(np.asarray(s["cls_label"] > 0).sum())
            key = key + (_slot_need_bucket(need, num_fg, slot_buckets),)
        buf = buckets.setdefault(key, [])
        buf.append(s)
        if len(buf) == batch_size:
            yield key[:2], buf
            buckets[key] = []
    for key, buf in buckets.items():
        if not buf:
            continue
        blank_src = buf[-1]
        while len(buf) < batch_size:
            blank = dict(blank_src)
            blank["label"] = np.full_like(blank_src["label"], 255)
            blank["_pad"] = True   # per-image dump loops skip these
            buf.append(blank)
        yield key[:2], buf


def _batched(dataset, batch_size):
    buf = []
    for i in range(len(dataset)):
        buf.append(dataset[i])
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        # repeat the last sample to keep shapes static; extra rows carry
        # all-255 GT so they add nothing to the hist
        pad = buf[-1]
        while len(buf) < batch_size:
            blank = dict(pad)
            blank["label"] = np.full_like(pad["label"], 255)
            blank["_pad"] = True
            buf.append(blank)
        yield buf


def _slot_need_bucket(need: int, num_fg: int, buckets) -> int | None:
    """Smallest slot bucket covering `need` present classes (None = full
    stack)."""
    for b in sorted(buckets):
        if need <= b < num_fg:
            return b
    return None


def _slots_bucket(cls_batch, num_fg: int,
                  buckets=(2, 3, 4, 5, 6, 8, 12, 16)) -> int | None:
    """Smallest slot bucket covering the batch's max label cardinality
    (host-side; one compiled specialization per bucket). None = full stack.

    PAR's diffusion is load-bound proportional to 1+slots channels
    (CLAUDE.md), so the small buckets are worth their extra compiled
    specializations: most VOC images carry 1-2 classes (2-slot, ~40% less
    PAR than 4-slot) and 3-class batches save another ~20% in the 3-slot
    bucket. Trim `buckets` (RefineConfig.slot_buckets) where compiles are
    expensive."""
    need = int(np.asarray(cls_batch > 0).sum(axis=1).max()) if len(
        np.shape(cls_batch)) else num_fg
    return _slot_need_bucket(need, num_fg, buckets)


def _maybe_shard(mesh, *arrays):
    if mesh is None:
        return arrays
    from ..parallel import shard_batch
    return shard_batch(arrays, mesh)


# ---------------------------------------------------------------------------
# sweep hist checkpointing (reference tools/test_msc_flip_voc.py:57-131
# checkpoints its hist every 100 images so 40k-image sweeps survive kills)
# ---------------------------------------------------------------------------

def _sweep_resume(path: str | None, fingerprint: str, num_classes: int):
    """-> (hist, batches_done). Restores only when the saved fingerprint
    (dataset size / batch / protocol) matches — a changed protocol restarts
    from scratch rather than mixing histograms."""
    import os
    if path and os.path.exists(path):
        d = np.load(path)
        if str(d["fingerprint"]) == fingerprint:
            return jnp.asarray(d["hist"]), int(d["done"])
    return init_hist(num_classes), 0


def _sweep_save(path: str | None, hist, done: int, fingerprint: str) -> None:
    if not path:
        return
    import os
    tmp = path + ".tmp.npz"
    np.savez(tmp, hist=np.asarray(hist), done=done, fingerprint=fingerprint)
    os.replace(tmp, path)            # atomic: a kill never corrupts


def _sweep_done(path: str | None) -> None:
    import os
    if path and os.path.exists(path):
        os.remove(path)


def _skip_batches(gen, start: int):
    """Skip the first `start` batches of a (canvas, samples) stream without
    prepping them (dataset decode still happens — bucketing is
    label-shape-dependent; device work and host resize are skipped)."""
    for i, item in enumerate(gen):
        if i >= start:
            yield item


def run_lam_eval(params: dict, dataset, text_attr, cfg: ExcelConfig,
                 mode: str = "training_free", batch_size: int = 4,
                 resize: int | None = None, progress=None, save_cam=None,
                 save_lam_crf=None, mesh=None, crf_tpu: bool = False,
                 checkpoint_path: str | None = None,
                 checkpoint_every: int = 100):
    """LAM pseudo-label sweep -> scores dict (tools/infer_lam.py protocol).

    save_cam(name, image_u8 [h,w,3], cams [1+C_fg,h,w]) optionally receives
    each image's normed pre-PAR per-class maps (the reference's
    `normed_attr_maps` CAM dumps, tools/infer_lam.py:97-111).
    save_lam_crf(name, valid_lam [1+K,h,w], keys [K]) receives the crf_post
    spill (tools/infer_lam.py:116-119): bg + the image's K present-class
    normed cams plus their 0-based fg indices (ascending), for the host
    DenseCRF pass (engine/crf_post.run_crf_post kind="lam").
    crf_tpu=True additionally runs the ON-DEVICE conv mean-field CRF branch
    inside the sweep (lam_crf_refine — the device analogue of crf_post,
    no spill/host lattice) and returns (scores, crf_scores).
    checkpoint_path: periodic hist+progress checkpoint (~every
    `checkpoint_every` images) to resume a killed sweep from — the
    reference's restart idiom (tools/test_msc_flip_voc.py:57-131). Per-image
    dump sweeps are not resumable (files of skipped batches would be
    missing).
    """
    resize = resize or cfg.clip.image_size
    # "sg1": slot-grouped batch order (r4) — invalidates pre-grouping hists
    fp = (f"lam:sg1:{len(dataset)}:{batch_size}:{mode}:{resize}:"
          f"{cfg.num_classes}:{cfg.data.eval_pad}"
          f":proc{jax.process_index()}/{jax.process_count()}")
    if checkpoint_path and jax.process_count() > 1:
        # per-process partial hists must not share one file
        checkpoint_path = f"{checkpoint_path}.p{jax.process_index()}"
    if save_cam is not None or save_lam_crf is not None or crf_tpu:
        checkpoint_path = None
    hist, start = _sweep_resume(checkpoint_path, fp, cfg.num_classes)
    crf_hist = init_hist(cfg.num_classes) if crf_tpu else None
    n_done = start * batch_size
    last_saved = n_done
    # slot-homogeneous batches (skipped for save_cam sweeps — they run the
    # full-class stack anyway, and dump order should follow the dataset;
    # crf spills keep the production slot compaction — their files are
    # keyed by name, and the compacted stack IS the spill format)
    sb = None if save_cam is not None else cfg.refine.slot_buckets
    prepped = prefetch_iter(
        (cv, b, _prep_batch(b, resize, cv, with_canvas_images=crf_tpu))
        for cv, b in _skip_batches(
            _bucketed_batches(dataset, batch_size, cfg.data.eval_pad,
                              slot_buckets=sb, num_fg=cfg.num_fg),
            start))
    for canvas, samples, prep in prepped:
        images, cls, labels, valid = prep[:4]
        canvas_imgs = jnp.asarray(prep[4]) if crf_tpu else None
        slots = None if save_cam else _slots_bucket(
            cls, cfg.num_fg, cfg.refine.slot_buckets)
        images, cls, labels, valid = _maybe_shard(mesh, images, cls, labels,
                                                  valid)
        if crf_tpu:
            canvas_imgs, = _maybe_shard(mesh, canvas_imgs)
        if save_cam is None and save_lam_crf is None:
            if crf_tpu:
                hist, crf_hist = lam_crf_hist_step(
                    hist, crf_hist, params, images, cls, labels, valid,
                    canvas_imgs, text_attr, cfg, canvas, mode,
                    class_slots=slots)
            else:
                hist = lam_eval_hist_step(hist, params, images, cls, labels,
                                          valid, text_attr, cfg, canvas,
                                          mode, class_slots=slots)
        else:
            preds, cams = lam_eval_step(params, images, cls, valid,
                                        text_attr, cfg, canvas, mode,
                                        return_cams=True, class_slots=slots)
            hist = update_hist(hist, labels, preds, cfg.num_classes)
            if crf_tpu:
                crf_preds = lam_crf_refine(cams, canvas_imgs, cls, valid,
                                           cfg, class_slots=slots)
                crf_hist = update_hist(crf_hist, labels, crf_preds,
                                       cfg.num_classes)
            cams_np = np.asarray(cams)
            for i, s in enumerate(samples):
                if s.get("_pad"):   # remainder padding: no file emission
                    continue
                h, w = s["label"].shape
                if save_cam:
                    save_cam(s["name"], s["image"][:h, :w],
                             cams_np[i, :, :h, :w])
                if save_lam_crf:
                    keys = np.flatnonzero(np.asarray(s["cls_label"]) > 0)
                    if slots is None:
                        # full stack: channel c+1 is fg class c
                        chans = np.concatenate(([0], keys + 1))
                        valid_lam = cams_np[i][chans][:, :h, :w]
                    else:
                        # compacted: present classes ascending in slots 1..K
                        valid_lam = cams_np[i, :1 + len(keys), :h, :w]
                    save_lam_crf(s["name"], valid_lam, keys)
        n_done += len(samples)
        if checkpoint_path and n_done - last_saved >= checkpoint_every:
            _sweep_save(checkpoint_path, hist, n_done // batch_size, fp)
            last_saved = n_done
        if progress:
            progress(len(samples))
    _sweep_done(checkpoint_path)
    if crf_tpu:
        return (scores_from_hist(global_sum_host(hist)),
                scores_from_hist(global_sum_host(crf_hist)))
    return scores_from_hist(global_sum_host(hist))


def run_validation(params: dict, dataset, text_attr, cfg: ExcelConfig,
                   batch_size: int = 4, progress=None, mesh=None):
    """In-training validation -> (pseudo scores, seg scores)."""
    hist_p = init_hist(cfg.num_classes)
    hist_s = init_hist(cfg.num_classes)
    prepped = prefetch_iter(
        (cv, b, _prep_batch(b, cfg.clip.image_size, cv))
        for cv, b in _bucketed_batches(dataset, batch_size,
                                       cfg.data.eval_pad,
                                       slot_buckets=cfg.refine.slot_buckets,
                                       num_fg=cfg.num_fg))
    for canvas, samples, prep in prepped:
        images, cls, labels, valid = prep
        slots = _slots_bucket(cls, cfg.num_fg,
                              cfg.refine.slot_buckets)
        images, cls, labels, valid = _maybe_shard(mesh, images, cls, labels,
                                                  valid)
        hist_p, hist_s = val_hist_step(hist_p, hist_s, params, images, cls,
                                       labels, valid, text_attr, cfg,
                                       canvas, class_slots=slots)
        if progress:
            progress(len(samples))
    return (scores_from_hist(global_sum_host(hist_p)),
            scores_from_hist(global_sum_host(hist_s)))


def run_msc_seg_eval(params: dict, dataset, text_attr, cfg: ExcelConfig,
                     scales=(1.0, 0.7, 1.2, 1.5), batch_size: int = 4,
                     resize: int | None = None, progress=None,
                     save_logits=None, save_pred=None,
                     crf_tpu: bool = False, mesh=None,
                     checkpoint_path: str | None = None,
                     checkpoint_every: int = 100):
    """MSC+flip segmentation sweep -> scores (tools/infer_seg_voc.py:47-101).

    save_logits(name, logits [C, h, w]) / save_pred(name, label [h, w])
    optionally receive per-image outputs (CRF post-processing, VOC server
    export). crf_tpu=True runs the on-device convolutional mean-field CRF
    (ops/crf_tpu.py) on the fused logits before the argmax — the fully
    on-TPU alternative to the host C++ lattice pass.
    checkpoint_path: periodic hist+progress checkpoint for resumable long
    sweeps (reference tools/test_msc_flip_voc.py:57-131); disabled when
    per-image dumps are requested (their files would be missing on resume).
    """
    import dataclasses

    base = resize or cfg.clip.image_size
    # crf_tpu sweeps also fingerprint the CRF parameter set (incl. the
    # CLI-flippable long_range) — a resumed hist must not silently blend
    # predictions computed under different CRF settings
    crf_fp = f"{cfg.crf}" if crf_tpu else ""
    fp = (f"msc:{len(dataset)}:{batch_size}:{base}:{scales}:{crf_tpu}:"
          f"{crf_fp}:{cfg.num_classes}:{cfg.data.eval_pad}"
          f":proc{jax.process_index()}/{jax.process_count()}")
    if checkpoint_path and jax.process_count() > 1:
        # per-process partial hists must not share one file
        checkpoint_path = f"{checkpoint_path}.p{jax.process_index()}"
    if save_logits is not None or save_pred is not None:
        checkpoint_path = None
    hist, start = _sweep_resume(checkpoint_path, fp, cfg.num_classes)
    n_done = start * batch_size
    last_saved = n_done
    size_cfgs = {}
    for sc in scales:
        size = int(base * sc)
        size_cfgs[sc] = dataclasses.replace(
            cfg, clip=dataclasses.replace(cfg.clip, image_size=size))

    def produce():
        for cv, samples in _skip_batches(
                _bucketed_batches(dataset, batch_size, cfg.data.eval_pad),
                start):
            prep = _prep_batch(samples, base, cv,
                               with_canvas_images=crf_tpu)
            scale_images = {
                sc: np.stack([resize_bilinear(s["image"],
                                              (int(base * sc),) * 2)
                              for s in samples])
                for sc in scales}
            yield cv, samples, prep, scale_images

    want_dumps = save_logits is not None or save_pred is not None
    for canvas, samples, prep, scale_images in prefetch_iter(produce()):
        _, cls, labels, valid = prep[:4]
        labels, valid = _maybe_shard(mesh, labels, valid)
        # one path for both hist-only and per-image-dump sweeps: all scales
        # + (optional on-TPU CRF) + argmax + hist in one program; dumps are
        # an optional device->host spill of the same program's outputs
        imgs = tuple(_maybe_shard(mesh, scale_images[sc])[0]
                     for sc in scales)
        canvas_imgs = None
        if crf_tpu:
            (canvas_imgs,) = _maybe_shard(mesh, prep[4])
            canvas_imgs = jnp.asarray(canvas_imgs)
        out = msc_hist_step(
            hist, params, imgs, labels, jnp.asarray(valid), text_attr,
            tuple(size_cfgs[sc] for sc in scales), canvas,
            tuple(sc != 1.0 for sc in scales),
            canvas_images=canvas_imgs, use_crf=crf_tpu,
            return_outputs=want_dumps)
        if want_dumps:
            hist, logits, preds = out
            logits_np = np.asarray(logits)
            preds_np = np.asarray(preds)
            for i, s in enumerate(samples):
                if s.get("_pad"):   # remainder padding: no file emission
                    continue
                h, w = s["label"].shape
                if save_logits:
                    save_logits(s["name"],
                                logits_np[i, :, :h, :w] / len(scales))
                if save_pred:
                    save_pred(s["name"], preds_np[i, :h, :w])
        else:
            hist = out
        n_done += len(samples)
        if checkpoint_path and n_done - last_saved >= checkpoint_every:
            _sweep_save(checkpoint_path, hist, n_done // batch_size, fp)
            last_saved = n_done
        if progress:
            progress(len(samples))
    _sweep_done(checkpoint_path)
    return scores_from_hist(global_sum_host(hist))
