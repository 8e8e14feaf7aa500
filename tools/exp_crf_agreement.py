"""Quantify the on-TPU convolutional mean-field CRF against the C++ lattice.

The on-TPU CRF (ops/crf_tpu.py) truncates the bilateral support at ±55 px
(vs the reference's dense sigma_xy=67 kernel) and evaluates a sparse dilated
neighborhood instead of the permutohedral lattice. This tool measures what
that approximation costs: argmax disagreement % and per-class IoU deltas
between the two, over structured synthetic scenes (blobs / thin structures
/ texture — data/synthetic.crf_scene) at the reference's parameter sets:

  voc       iter 10, pos 3/1,  bi 4/67/3    (tools/infer_seg_voc.py:113-120)
  msc_dev   iter 10, pos 3/3,  bi 4/64/5    (tools/test_msc_flip_voc.py:144-151)
  label     gt_prob 0.7 unary, pos 3/3, bi 10/50/5  (utils/dcrf.py:26-40)

Runs on CPU jax (the math is identical to the TPU path; Pallas only changes
the message-pass schedule — parity tested separately). Numbers recorded in
PARITY.md; tolerance bounds wired in tests/test_crf_tpu.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from excel_tpu.crf import DenseCRF
from excel_tpu.data.synthetic import crf_scene
from excel_tpu.ops.crf_tpu import crf_meanfield

PARAM_SETS = {
    "voc": dict(iters=10, pos_w=3.0, pos_xy_std=1.0, bi_w=4.0,
                bi_xy_std=67.0, bi_rgb_std=3.0),
    "msc_dev": dict(iters=10, pos_w=3.0, pos_xy_std=3.0, bi_w=4.0,
                    bi_xy_std=64.0, bi_rgb_std=5.0),
}
LABEL_PARAMS = dict(iters=10, pos_w=3.0, pos_xy_std=3.0, bi_w=10.0,
                    bi_xy_std=50.0, bi_rgb_std=5.0)


def iou_per_class(pred, gt, num_classes):
    ious = np.full(num_classes, np.nan)
    for c in range(num_classes):
        inter = ((pred == c) & (gt == c)).sum()
        union = ((pred == c) | (gt == c)).sum()
        if union:
            ious[c] = inter / union
    return ious


def compare(image, gt, probs, params, num_classes):
    p = dict(params)
    iters = p.pop("iters")
    q_cpp = DenseCRF(iter_max=iters, **{k: p[k] for k in
                                        ("pos_w", "pos_xy_std", "bi_w",
                                         "bi_xy_std", "bi_rgb_std")})(
        image, probs)
    q_tpu = np.asarray(crf_meanfield(
        jnp.asarray(image[None]), jnp.asarray(probs[None]), iters=iters,
        use_pallas=False, **p))[0]
    a_cpp = q_cpp.argmax(0)
    a_tpu = q_tpu.argmax(0)
    dis = float((a_cpp != a_tpu).mean())
    iou_c = iou_per_class(a_cpp, gt, num_classes)
    iou_t = iou_per_class(a_tpu, gt, num_classes)
    present = ~(np.isnan(iou_c) & np.isnan(iou_t))
    delta = np.abs(np.nan_to_num(iou_t[present]) -
                   np.nan_to_num(iou_c[present]))
    acc_c = float((a_cpp == gt).mean())
    acc_t = float((a_tpu == gt).mean())
    return dict(disagree_pct=100 * dis, max_iou_delta=float(delta.max()),
                miou_cpp=float(np.nanmean(iou_c[present])),
                miou_tpu=float(np.nanmean(iou_t[present])),
                acc_cpp=acc_c, acc_tpu=acc_t)


def label_probs(labels, num_classes, gt_prob=0.7):
    h, w = labels.shape
    probs = np.full((num_classes, h, w),
                    (1.0 - gt_prob) / (num_classes - 1), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    probs[labels.astype(np.int64), ys, xs] = gt_prob
    return probs


def main():
    num_classes = int(os.environ.get("NUM_CLASSES", "21"))
    print(f"scene x param-set agreement (C={num_classes}, 192x256):")
    print(f"{'scene':9s} {'params':8s} {'disagree%':>9s} {'maxIoU_d':>9s} "
          f"{'mIoU_cpp':>9s} {'mIoU_tpu':>9s} {'acc_cpp':>8s} {'acc_tpu':>8s}")
    for kind in ("blobs", "thin", "texture"):
        image, gt, probs = crf_scene(kind, seed=0, num_classes=num_classes)
        for name, params in PARAM_SETS.items():
            r = compare(image, gt, probs, params, num_classes)
            print(f"{kind:9s} {name:8s} {r['disagree_pct']:9.2f} "
                  f"{r['max_iou_delta']:9.4f} {r['miou_cpp']:9.4f} "
                  f"{r['miou_tpu']:9.4f} {r['acc_cpp']:8.4f} "
                  f"{r['acc_tpu']:8.4f}", flush=True)
        # label-unary variant: unary from the noisy argmax label map
        noisy = probs.argmax(0)
        lp = label_probs(noisy, num_classes)
        r = compare(image, gt, lp, LABEL_PARAMS, num_classes)
        print(f"{kind:9s} {'label':8s} {r['disagree_pct']:9.2f} "
              f"{r['max_iou_delta']:9.4f} {r['miou_cpp']:9.4f} "
              f"{r['miou_tpu']:9.4f} {r['acc_cpp']:8.4f} "
              f"{r['acc_tpu']:8.4f}", flush=True)


if __name__ == "__main__":
    main()
