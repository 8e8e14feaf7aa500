"""Synthetic mini-dataset generator (VOC directory layout).

The environment has no real VOC/COCO; tests and CLI smoke runs generate a
tiny dataset on the fly: colored geometric blobs on textured background,
with exact segmentation masks. This fills the reference's fixture gap
(SURVEY.md §4: it has no test data of any kind).
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _draw_sample(rng: np.random.Generator, size_range=(200, 400),
                 num_fg: int = 20, max_objects: int = 3):
    h = int(rng.integers(*size_range))
    w = int(rng.integers(*size_range))
    image = rng.integers(0, 80, (h, w, 3), dtype=np.uint8)
    label = np.zeros((h, w), np.uint8)
    palette = rng.integers(100, 256, (num_fg + 1, 3))
    for _ in range(int(rng.integers(1, max_objects + 1))):
        cls = int(rng.integers(1, num_fg + 1))
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        ry, rx = rng.integers(h // 8, h // 3), rng.integers(w // 8, w // 3)
        ys, xs = np.ogrid[:h, :w]
        blob = ((ys - cy) / max(ry, 1)) ** 2 + ((xs - cx) / max(rx, 1)) ** 2 <= 1
        image[blob] = palette[cls]
        label[blob] = cls
    return image, label


def make_voc_tree(root: str, num_images: int = 8, seed: int = 0,
                  num_fg: int = 20, size_range=(200, 400)) -> str:
    """Write JPEGImages/ + SegmentationClassAug/ + split lists + cls labels
    under `root`; returns the split dir."""
    img_dir = os.path.join(root, "JPEGImages")
    lab_dir = os.path.join(root, "SegmentationClassAug")
    split_dir = os.path.join(root, "splits")
    for d in (img_dir, lab_dir, split_dir):
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(seed)
    names, onehots = [], []
    for i in range(num_images):
        name = f"synth_{i:06d}"
        image, label = _draw_sample(rng, size_range, num_fg)
        Image.fromarray(image).save(os.path.join(img_dir, name + ".jpg"),
                                    quality=95)
        Image.fromarray(label).save(os.path.join(lab_dir, name + ".png"))
        onehot = np.zeros(num_fg, np.uint8)
        present = np.unique(label)
        onehot[present[present > 0] - 1] = 1
        names.append(name)
        onehots.append(onehot)

    for split in ("train_aug", "train", "val", "test"):
        with open(os.path.join(split_dir, split + ".txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    np.savez(os.path.join(split_dir, "cls_labels.npz"),
             names=np.asarray(names), labels=np.stack(onehots))
    return split_dir
