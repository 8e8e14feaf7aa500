"""Re-score saved prediction PNGs against ground truth — no model run.

Reference: tools/infer_seg_coco_from_crf_pred.py:39-76 (iterate on CRF
parameters / prediction post-processing without re-running inference).

    python -m excel_tpu.cli.rescore --dataset voc --data-root /data/VOC2012 \
        --pred-dir work_dirs/run/preds [--suffix _crf]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from ..text.class_names import class_list
from ..utils import (format_metrics_table, init_hist, scores_from_hist,
                     setup_logger, update_hist)
from .common import add_common_args, eval_dataset, resolve


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--split", default=None)
    ap.add_argument("--suffix", default="",
                    help="prediction filename suffix (e.g. _crf)")
    args = ap.parse_args(argv)

    logger = setup_logger()
    args.random_init = True          # no weights needed for re-scoring
    cfg, _, _ = resolve(args)
    dataset = eval_dataset(cfg, split=args.split)

    hist = init_hist(cfg.num_classes)
    scored = missing = 0
    for i in range(len(dataset)):
        s = dataset[i]
        path = os.path.join(args.pred_dir, s["name"] + args.suffix + ".png")
        if not os.path.exists(path):
            missing += 1
            continue
        pred = np.asarray(Image.open(path)).astype(np.int32)
        hist = update_hist(hist, s["label"], pred, cfg.num_classes)
        scored += 1
    if missing:
        logger.info("WARNING: %d/%d predictions missing", missing,
                    len(dataset))
    scores = scores_from_hist(np.asarray(hist))
    names = (class_list(cfg.data.dataset)
             if "synthetic" not in cfg.data.dataset
             else [f"c{i}" for i in range(cfg.num_classes)])
    logger.info("re-scored %d preds:\n%s", scored,
                format_metrics_table(scores, names))
    return scores


if __name__ == "__main__":
    main()
