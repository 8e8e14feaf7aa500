"""Generate image-level one-hot label files from segmentation masks.

The reference ships pickled dicts (datasets/voc/cls_labels_onehot.npy;
the COCO one is a missing large blob in the snapshot). This regenerates the
equivalent `cls_labels.npz` (names + [N, num_fg] uint8) for any dataset in
VOC or COCO layout by scanning the masks of the given splits — the same
derivation as VOC12ClsDataset._to_onehot (reference datasets/voc.py:119-133).

    python tools/make_cls_labels.py --dataset voc --data-root /data/VOC2012 \
        --splits train_aug val --out assets/splits/voc/cls_labels.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from excel_tpu.config import asset_path
from excel_tpu.data.datasets import CocoDataset, VocDataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["voc", "coco"], required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split-dir", default=None)
    ap.add_argument("--splits", nargs="+", required=True)
    ap.add_argument("--num-fg", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    split_dir = args.split_dir or asset_path("splits", args.dataset)
    cls = VocDataset if args.dataset == "voc" else CocoDataset
    names, onehots = [], []
    for split in args.splits:
        ds = cls(args.data_root, split_dir, split, "train")
        num_fg = args.num_fg or ds.num_fg
        from excel_tpu.data.datasets import read_label
        for i in range(len(ds)):
            name = ds.name_list[i]
            label = read_label(ds.label_path(name))
            present = np.unique(label)
            present = present[(present > 0) & (present != 255)]
            onehot = np.zeros(num_fg, np.uint8)
            onehot[present.astype(int) - 1] = 1
            names.append(name)
            onehots.append(onehot)
            if (i + 1) % 1000 == 0:
                print(f"{split}: {i + 1}/{len(ds)}")
    np.savez(args.out, names=np.asarray(names), labels=np.stack(onehots))
    print(f"{len(names)} entries -> {args.out}")


if __name__ == "__main__":
    main()
