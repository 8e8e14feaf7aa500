"""Training engine: optax optimizer, jitted train step, phase schedule.

Replicates the reference training loop (scripts/train_voc.py:170-257) as a
handful of compiled specializations:

- The LR schedule is the reference's `PolyWarmupAdamW` (utils/optimizer.py:
  38-68): linear warmup from warmup_ratio over `warmup_iters`, then poly
  decay (1 - t/T)^power, applied multiplicatively to the 10x head LR
  (engine/optimizer_engine.py:5-28 — only param group 3, the decoder+fuse
  head, is nonempty, so a single optax schedule covers the live behavior).
- The 14000/24000-iteration phase switches (train_voc.py:188,210) become
  static booleans; the driver picks one of three compiled train steps per
  phase instead of branching on a traced step counter. Each specialization
  is a pure function — XLA fuses pseudo-label generation, the dual forward,
  and the backward pass into one program with zero host round-trips (the
  reference crosses GPU<->CPU per image per class for cv2, SURVEY.md §3.1).
- Gradients flow only into params["head"]; the frozen CLIP never appears as
  a differentiated input, replacing torch.no_grad/requires_grad bookkeeping.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ExcelConfig, TrainConfig
from ..models.excel import excel_forward
from ..models.losses import aff_loss, seg_loss
from ..ops.labels import affinity_label, radius_mask
from .pipeline import denormalize_images, normalize_images, pseudo_labels


class TrainState(NamedTuple):
    step: jax.Array          # int32 scalar
    head: Any                # trainable head param pytree
    opt_state: Any           # optax state


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """The reference's LR multipliers, scaled by the 10x head LR; applied
    for `global_step` *before* each update, matching optax count semantics.

    - poly (default): PolyWarmupAdamW, utils/optimizer.py:52-63
    - cos:            CosWarmupAdamW, utils/optimizer.py:19-31 (the
                      reference's impl crashes on numpy>=1.24 via np.float;
                      this is the intended math)
    - poly_sgd warmup: PolyWarmupSGD's decreasing-warmup quirk (x10 then
                      (1-t/W)^p), utils/optimizer.py:85-95
    """
    base = cfg.lr * 10.0
    kind = cfg.schedule

    def sched(count):
        t = count.astype(jnp.float32)
        if kind == "cos":
            warm = (t / cfg.warmup_iters
                    + (1.0 - t / cfg.warmup_iters) * cfg.warmup_ratio)
            rest = (jnp.cos((t - cfg.warmup_iters)
                            / (cfg.max_iters - cfg.warmup_iters) * jnp.pi)
                    * 0.5 + 0.5)
        elif kind == "poly_sgd":
            warm = 10.0 * jnp.maximum(1.0 - t / cfg.warmup_iters,
                                      0.0) ** cfg.power
            rest = jnp.maximum(1.0 - (t - cfg.warmup_iters)
                               / (cfg.max_iters - cfg.warmup_iters),
                               0.0) ** cfg.power
        else:
            # algebraically 1 - (1 - t/W)(1 - ratio), stable in fp32
            warm = (cfg.warmup_ratio
                    + (1.0 - cfg.warmup_ratio) * t / cfg.warmup_iters)
            rest = jnp.maximum(1.0 - t / cfg.max_iters, 0.0) ** cfg.power
        return base * jnp.where(t < cfg.warmup_iters, warm, rest)

    return sched


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW eps 1e-8 / SGD momentum 0.9 (utils/optimizer.py:41,73)."""
    if cfg.schedule == "poly_sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(lr_schedule(cfg), momentum=0.9))
    return optax.adamw(lr_schedule(cfg), b1=cfg.betas[0], b2=cfg.betas[1],
                       eps=1e-8, weight_decay=cfg.weight_decay)


def init_train_state(head_params: Any, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), head=head_params,
                      opt_state=opt.init(head_params))


# ---------------------------------------------------------------------------
# the train step
# ---------------------------------------------------------------------------

def _phase(cfg: ExcelConfig, step: int) -> tuple[bool, bool]:
    """(lvc_calibrated, seg_affinity) statics for a given python-int step."""
    return (step >= cfg.train.lvc_calibrate_iter,
            step >= cfg.train.seg_affinity_iter)


def train_step(state: TrainState, clip_params: dict, images_u8: jax.Array,
               cls_label: jax.Array, text_attr: jax.Array, rng: jax.Array,
               cfg: ExcelConfig, *, calibrated: bool, seg_affinity: bool,
               class_slots: int | None = None):
    """One training iteration (train_voc.py:172-225).

    images_u8: [B, H, W, 3] uint8 RGB crops (already augmented host-side).
    cls_label: [B, num_fg] one-hot image-level labels.
    class_slots: refine only bg + this many present-class channels in the
    pseudo-label path (exact when it covers the batch's label cardinality;
    the driver buckets it host-side per batch).
    Returns (new_state, metrics dict).
    """
    images = normalize_images(images_u8)
    crop_hw = images.shape[1:3]
    grid = crop_hw[0] // cfg.clip.patch_size
    # PAR guidance uses denormalized images in training (train_voc.py:182)
    par_imgs = denormalize_images(images).transpose(0, 3, 1, 2)
    opt = make_optimizer(cfg.train)
    mask = radius_mask(grid, grid, cfg.refine.radius)

    def loss_fn(head):
        params = {"clip": clip_params, "head": head}
        # pre-calibration phases run SVC without seg_attn, which consumes
        # only the block-mean attention (in-kernel accumulated); the
        # calibrated phases need the per-block stack for the keep-mask
        from .pipeline import attn_mode_for
        out = excel_forward(params, images, text_attr, cfg, dropout_rng=rng,
                            attn_mode=("stack" if calibrated
                                       else attn_mode_for(cfg)))
        lams = out.lams
        if calibrated:
            # second encoder pass with LVC-calibrated attention
            # (train_voc.py:188-189, cure_attr_map)
            lams = excel_forward(params, images, text_attr, cfg,
                                 ex_feats=out.fused)
        seg_attn = out.attn_pred if calibrated else None
        pseudos = pseudo_labels(
            jax.lax.stop_gradient(lams),
            out.attn_weights, par_imgs, cls_label, cfg, crop_hw,
            cfg.refine.caa_threshold,
            seg_attn=(jax.lax.stop_gradient(seg_attn)
                      if seg_attn is not None else None),
            class_slots=class_slots)

        # seg loss on logits upsampled to crop res (train_voc.py:202-203)
        b, hw, c = out.segs.shape
        segs = out.segs.transpose(0, 2, 1).reshape(b, c, grid, grid)
        segs = jax.image.resize(segs, (b, c, *crop_hw), method="linear")
        l_seg = seg_loss(segs, pseudos, ignore_index=cfg.refine.ignore_index)

        # affinity (diversity) loss (train_voc.py:207-212)
        seg_pred = jnp.argmax(jax.lax.stop_gradient(segs), axis=1)
        aff_src = seg_pred if seg_affinity else pseudos
        aff_target = affinity_label(aff_src, mask=mask,
                                    ignore_index=cfg.refine.ignore_index,
                                    downscale=cfg.clip.patch_size)
        l_aff = aff_loss(out.attn_pred, aff_target)

        total = cfg.train.w_seg * l_seg + cfg.train.w_diver * l_aff
        return total, {"seg_loss": l_seg, "diver_loss": l_aff,
                       "pseudos": pseudos}

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.head)
    updates, opt_state = opt.update(grads, state.opt_state, state.head)
    head = optax.apply_updates(state.head, updates)
    metrics = {"loss": total, "seg_loss": aux["seg_loss"],
               "diver_loss": aux["diver_loss"],
               "lr": lr_schedule(cfg.train)(state.step)}
    return TrainState(state.step + 1, head, opt_state), metrics


def compiled_train_step(cfg: ExcelConfig, *, calibrated: bool,
                        seg_affinity: bool, donate: bool = True,
                        class_slots: int | None = None):
    """Jit one phase specialization. State is donated (in-place update)."""
    fn = functools.partial(train_step, cfg=cfg, calibrated=calibrated,
                           seg_affinity=seg_affinity, class_slots=class_slots)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def phased_train_steps(cfg: ExcelConfig) -> dict[tuple[bool, bool], Any]:
    """All phase specializations the schedule can reach."""
    phases = {(False, False)}
    phases.add(_phase(cfg, cfg.train.lvc_calibrate_iter))
    phases.add(_phase(cfg, max(cfg.train.seg_affinity_iter,
                               cfg.train.lvc_calibrate_iter)))
    return {p: compiled_train_step(cfg, calibrated=p[0], seg_affinity=p[1])
            for p in sorted(phases)}


class TrainStepCache:
    """Lazily-compiled train steps keyed by (phase, class-slot bucket).

    The slot bucket is picked per batch from its label cardinality
    (engine/evaluate._slots_bucket semantics, restricted to `buckets` to
    bound the number of compilations); each (phase, bucket) pair compiles
    once and is reused."""

    def __init__(self, cfg: ExcelConfig, buckets: tuple[int, ...] = (4, 8)):
        self.cfg = cfg
        self.buckets = tuple(b for b in sorted(buckets) if b < cfg.num_fg)
        self._steps: dict[tuple[bool, bool, int | None], Any] = {}

    def slots_for(self, cls_batch) -> int | None:
        import numpy as np
        need = int(np.asarray(cls_batch > 0).sum(axis=1).max())
        for b in self.buckets:
            if need <= b:
                return b
        return None

    def __call__(self, phase: tuple[bool, bool], cls_batch):
        slots = self.slots_for(cls_batch)
        key = (*phase, slots)
        if key not in self._steps:
            self._steps[key] = compiled_train_step(
                self.cfg, calibrated=phase[0], seg_affinity=phase[1],
                class_slots=slots)
        return self._steps[key]

    def full(self, phase: tuple[bool, bool]):
        """Full-class-stack step (no slot compaction) — the multi-host
        driver uses this so every process compiles the same program
        regardless of its local batch's label cardinality."""
        key = (*phase, None)
        if key not in self._steps:
            self._steps[key] = compiled_train_step(
                self.cfg, calibrated=phase[0], seg_affinity=phase[1],
                class_slots=None)
        return self._steps[key]
