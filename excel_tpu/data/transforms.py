"""Host-side augmentation transforms (reference datasets/transforms.py).

Numpy/PIL ops over uint8 HWC images. Unlike the reference, normalization is
NOT done here — batches stay uint8 (4x less host->device bandwidth) and the
ImageNet normalization runs on device inside the jitted step
(engine/pipeline.normalize_images). All randomness flows through an explicit
np.random.Generator (the reference uses global `random`, which breaks
per-worker reproducibility).

Parity map:
- random_scaling            transforms.py:25-50  (PIL bilinear / nearest)
- random_fliplr             transforms.py:74-87
- random_crop               transforms.py:118-175 (zero-pad, cat-max-ratio
                            retry, img_box valid-region tracking)
- photometric_distortion    transforms.py:177-273 (mmcv-style HSV jitter;
                            constructed by every dataset but only called on
                            the COCO seg-aug path — kept for completeness)
"""
from __future__ import annotations

import numpy as np
from PIL import Image


def rescale(image: np.ndarray, scale: float,
            label: np.ndarray | None = None):
    """PIL bilinear image / nearest label resize by a scale factor
    (transforms.py:35-50: new size = (int(s*w), int(s*h)))."""
    h, w = image.shape[:2]
    size = (int(scale * w), int(scale * h))
    img = Image.fromarray(image.astype(np.uint8)).resize(
        size, resample=Image.BILINEAR)
    img = np.asarray(img)
    if label is None:
        return img
    lab = Image.fromarray(label).resize(size, resample=Image.NEAREST)
    return img, np.asarray(lab)


def random_scaling(image: np.ndarray, rng: np.random.Generator,
                   scale_range=(0.5, 2.0), label: np.ndarray | None = None):
    scale = rng.uniform(*scale_range)
    return rescale(image, scale, label)


def random_fliplr(image: np.ndarray, rng: np.random.Generator,
                  label: np.ndarray | None = None):
    if rng.random() > 0.5:
        image = np.fliplr(image)
        label = np.fliplr(label) if label is not None else None
    return image if label is None else (image, label)


def random_crop(image: np.ndarray, rng: np.random.Generator,
                crop_size: int, label: np.ndarray | None = None,
                mean_rgb=(0, 0, 0), ignore_index: int = 255,
                cat_max_ratio: float = 0.75):
    """Pad-to-crop + random window with single-class-domination retry
    (transforms.py:118-175). Returns (image, [label,] img_box) where
    img_box = [y0, y1, x0, x1] marks the valid (non-padding) region."""
    h, w = image.shape[:2]
    H, W = max(crop_size, h), max(crop_size, w)
    pad_img = np.empty((H, W, 3), dtype=image.dtype)
    pad_img[...] = np.asarray(mean_rgb, dtype=image.dtype)
    y_pad = rng.integers(0, H - h + 1)
    x_pad = rng.integers(0, W - w + 1)
    pad_img[y_pad:y_pad + h, x_pad:x_pad + w] = image

    pad_lab = None
    if label is not None:
        pad_lab = np.full((H, W), ignore_index, dtype=label.dtype)
        pad_lab[y_pad:y_pad + h, x_pad:x_pad + w] = label

    y0 = x0 = 0
    for _ in range(10):
        y0 = int(rng.integers(0, H - crop_size + 1))
        x0 = int(rng.integers(0, W - crop_size + 1))
        if pad_lab is None:
            break
        win = pad_lab[y0:y0 + crop_size, x0:x0 + crop_size]
        idx, cnt = np.unique(win, return_counts=True)
        cnt = cnt[idx != ignore_index]
        if cnt.size and cnt.max() / cnt.sum() < cat_max_ratio:
            break

    img = pad_img[y0:y0 + crop_size, x0:x0 + crop_size]
    img_box = np.asarray([max(y_pad - y0, 0),
                          min(y0 + crop_size, y_pad + h) - y0,
                          max(x_pad - x0, 0),
                          min(x0 + crop_size, x_pad + w) - x0],
                         dtype=np.int32)
    if label is None:
        return img, img_box
    return img, pad_lab[y0:y0 + crop_size, x0:x0 + crop_size], img_box


# ---------------------------------------------------------------------------
# photometric distortion (mmcv-style HSV jitter, transforms.py:177-273)
# ---------------------------------------------------------------------------

def _rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    """float32 RGB [0,255] -> HSV with H in [0,360), S,V as mmcv produces."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img.max(axis=-1)
    minc = img.min(axis=-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-10), 0.0)
    dz = np.maximum(delta, 1e-10)
    h = np.where(maxc == r, (g - b) / dz % 6.0,
                 np.where(maxc == g, (b - r) / dz + 2.0, (r - g) / dz + 4.0))
    h = np.where(delta == 0, 0.0, h) * 60.0
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0] / 60.0, hsv[..., 1], hsv[..., 2]
    i = np.floor(h) % 6
    f = h - np.floor(h)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    r = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return np.stack([r, g, b], axis=-1)


def photometric_distortion(image: np.ndarray, rng: np.random.Generator,
                           brightness_delta: int = 32,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_delta: int = 18) -> np.ndarray:
    """Random brightness / contrast / saturation / hue, with the mmcv
    random-contrast-order quirk. Input uint8 RGB, output float32 [0,255]."""
    img = image.astype(np.float32)
    if rng.integers(2):
        img = img + rng.uniform(-brightness_delta, brightness_delta)
    contrast_last = rng.integers(2)
    if not contrast_last and rng.integers(2):
        img = img * rng.uniform(*contrast_range)
    if rng.integers(2):
        hsv = _rgb_to_hsv(np.clip(img, 0, 255))
        hsv[..., 1] *= rng.uniform(*saturation_range)
        img = _hsv_to_rgb(np.clip(hsv, 0, None))
    if rng.integers(2):
        hsv = _rgb_to_hsv(np.clip(img, 0, 255))
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)) % 360
        img = _hsv_to_rgb(hsv)
    if contrast_last and rng.integers(2):
        img = img * rng.uniform(*contrast_range)
    return np.clip(img, 0, 255)
