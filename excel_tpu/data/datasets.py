"""VOC / COCO dataset readers (reference datasets/voc.py, datasets/coco.py).

Plain-Python readers producing numpy samples; batching/prefetch lives in
loader.py. Layout conventions match the reference exactly:

VOC  (voc.py:29-68):   root/JPEGImages/<name>.jpg,
                       root/SegmentationClassAug/<name>.png
COCO (coco.py:29-78):  root/JPEGImages/{train,val}/<name>.jpg,
                       root/SegmentationClass/{train,val}/<mask>.png where
                       mask = name[15:] (train) / name[13:] (val) — the
                       COCO_train2014_/COCO_val2014_ prefix slicing quirk.

Image-level labels come from assets/splits/<ds>/cls_labels.npz
(name -> one-hot over fg classes); for the test split labels are faked from
the image (voc.py:65-66). Grayscale images are stacked to RGB
(robust_read_image, coco.py:22-26).
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from . import transforms


def load_name_list(path: str) -> list[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def load_cls_labels(path: str) -> dict[str, np.ndarray]:
    z = np.load(path, allow_pickle=False)
    return {str(n): l for n, l in zip(z["names"], z["labels"])}


def read_image(path: str) -> np.ndarray:
    img = np.asarray(Image.open(path).convert("RGB"))
    return img


def read_label(path: str) -> np.ndarray:
    return np.asarray(Image.open(path))


class SegSample(dict):
    """name, image (uint8 HWC), label (int HW), cls_label (float [num_fg])."""


class VocDataset:
    """Base reader; stage 'train'/'val' read SegmentationClassAug masks,
    'test' fakes the label from the red channel (voc.py:65-66)."""

    num_fg = 20

    def __init__(self, root_dir: str, split_dir: str, split: str = "train_aug",
                 stage: str = "train"):
        self.root_dir = root_dir
        self.stage = stage
        self.img_dir = os.path.join(root_dir, "JPEGImages")
        self.label_dir = os.path.join(root_dir, "SegmentationClassAug")
        self.name_list = load_name_list(os.path.join(split_dir, split + ".txt"))
        cls_path = os.path.join(split_dir, "cls_labels.npz")
        self.cls_labels = (load_cls_labels(cls_path)
                           if os.path.exists(cls_path) else {})

    def __len__(self):
        return len(self.name_list)

    def label_path(self, name: str) -> str:
        return os.path.join(self.label_dir, name + ".png")

    def read(self, idx: int):
        name = self.name_list[idx]
        image = read_image(os.path.join(self.img_dir, name + ".jpg"))
        if self.stage == "test":
            label = image[:, :, 0]
        else:
            label = read_label(self.label_path(name))
        return name, image, label

    def cls_label_of(self, name: str, label: np.ndarray) -> np.ndarray:
        if name in self.cls_labels:
            return self.cls_labels[name].astype(np.float32)
        # derive from the mask (voc.py:119-133 _to_onehot)
        present = np.unique(label)
        present = present[(present != 0) & (present != 255)]
        onehot = np.zeros(self.num_fg, np.float32)
        onehot[present.astype(int) - 1] = 1.0
        return onehot


class CocoDataset(VocDataset):
    num_fg = 80

    def __init__(self, root_dir: str, split_dir: str, split: str = "train",
                 stage: str = "train"):
        super().__init__(root_dir, split_dir, split, stage)
        sub = "train" if "train" in split else "val"
        self.img_dir = os.path.join(root_dir, "JPEGImages", sub)
        self.label_dir = os.path.join(root_dir, "SegmentationClass", sub)
        self._prefix = 15 if sub == "train" else 13

    def label_path(self, name: str) -> str:
        return os.path.join(self.label_dir, name[self._prefix:] + ".png")

    def read(self, idx: int):
        name = self.name_list[idx]
        image = read_image(os.path.join(self.img_dir, name + ".jpg"))
        if self.stage == "test":
            label = image[:, :, 0]
        else:
            label = read_label(self.label_path(name))
        return name, image, label


class ClsCropDataset:
    """Training-view dataset (VOC12ClsDataset / CocoClsDataset semantics,
    voc.py:76-139): random rescale -> flip -> pad-crop with img_box ->
    uint8 crop. Sample: (name, image [S,S,3] u8, cls_label [num_fg],
    img_box [4], label [S,S])."""

    def __init__(self, base: VocDataset, crop_size: int = 320,
                 rescale_range=(0.5, 2.0), ignore_index: int = 255):
        self.base = base
        self.crop_size = crop_size
        self.rescale_range = rescale_range
        self.ignore_index = ignore_index

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx: int, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        name, image, label = self.base.read(idx)
        image, label = transforms.random_scaling(
            image, rng, self.rescale_range, label=label)
        image, label = transforms.random_fliplr(image, rng, label=label)
        image, label, img_box = transforms.random_crop(
            image, rng, self.crop_size, label=label,
            ignore_index=self.ignore_index)
        cls_label = self.base.cls_label_of(name, label)
        return dict(name=name, image=np.ascontiguousarray(image),
                    cls_label=cls_label, img_box=img_box,
                    label=np.ascontiguousarray(label.astype(np.int32)))


class EvalDataset:
    """Validation-view dataset: full-size image + label, no augmentation
    (the eval harness resizes on device / host as each protocol requires)."""

    def __init__(self, base: VocDataset):
        self.base = base

    def __len__(self):
        return len(self.base)

    def names(self) -> list[str]:
        """Sample names without decoding any image (index-aligned)."""
        return list(self.base.name_list)

    def __getitem__(self, idx: int):
        name, image, label = self.base.read(idx)
        cls_label = self.base.cls_label_of(name, label)
        return dict(name=name, image=image,
                    label=label.astype(np.int32), cls_label=cls_label)


def make_dataset(cfg_data, split: str, stage: str) -> VocDataset:
    cls = VocDataset if "voc" in cfg_data.dataset else CocoDataset
    return cls(cfg_data.root_dir, cfg_data.split_dir, split, stage)
