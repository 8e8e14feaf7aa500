"""Colormaps, label encoding, and VOC-server palette PNG export.

Reference: utils/imutils.py:7-50 (bit-trick colormap, encode_cmap),
utils/pyutils.py:183-214 (convert_test_seg2RGB — the palette PNG format the
official VOC evaluation server requires).
"""
from __future__ import annotations

import functools

import numpy as np
from PIL import Image


@functools.lru_cache(maxsize=2)
def colormap(n: int = 256) -> np.ndarray:
    """VOC bit-trick colormap [n, 3] uint8 (imutils.py:32-50)."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def encode_cmap(label: np.ndarray) -> np.ndarray:
    """int label map -> RGB uint8 (imutils.py:7-9)."""
    return colormap()[label.astype(np.int32)]


def save_palette_png(label: np.ndarray, path: str,
                     num_classes: int = 21) -> None:
    """Indexed-palette PNG for the VOC eval server (pyutils.py:183-214).
    The reference colors only the first 21 entries; we use the same VOC
    colormap for all classes."""
    im = Image.fromarray(label.astype(np.uint8))
    palette = []
    for i in range(256):
        palette.extend((i, i, i))
    palette[: 3 * num_classes] = colormap()[:num_classes].flatten().tolist()
    im.putpalette(palette)
    im.save(path)


def cam_overlay(image_u8: np.ndarray, cam: np.ndarray,
                alpha: float = 0.5) -> np.ndarray:
    """Jet-style CAM overlay grid cell (tbutils.py:36-61 equivalent,
    matplotlib-free): cam in [0,1] -> RGB heat blended onto the image."""
    c = np.clip(cam, 0.0, 1.0)
    heat = np.stack([
        np.clip(1.5 - np.abs(4 * c - 3.0), 0, 1),
        np.clip(1.5 - np.abs(4 * c - 2.0), 0, 1),
        np.clip(1.5 - np.abs(4 * c - 1.0), 0, 1),
    ], axis=-1)
    out = (1 - alpha) * image_u8.astype(np.float32) / 255.0 + alpha * heat
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)
