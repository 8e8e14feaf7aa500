"""Dense-CRF post-processing: ctypes binding to the native lattice.

Reference API parity (utils/dcrf.py):
- `DenseCRF(iter_max, pos_w, pos_xy_std, bi_w, bi_xy_std, bi_rgb_std)`
  callable on (image u8 HW3, probmap [C, H, W]) -> refined Q [C, H, W]
- `crf_inference(img, probs, t, labels)` with the hard-coded sxy=3/compat=3
  Gaussian + sxy=80/srgb=13/compat=10 bilateral parameter set (dcrf.py:7-24)

The native library (excel_tpu/native/densecrf.cpp, C++ permutohedral
lattice) is compiled on first use with g++ and cached next to the source.
`crf_batch` runs a sweep's worth of images on a small thread pool — the
GIL is released during the C call, replacing the reference's joblib
process pools (tools/infer_seg_voc.py:164-165).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "densecrf.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libexcelcrf.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    # -march=native: the .so is built on first use on the machine that runs
    # it, so native SIMD (AVX on x86 hosts) is always safe; fall back to
    # plain -O3 where the flag is unsupported, and finally drop -fopenmp for
    # toolchains without an OpenMP runtime (the pragmas degrade gracefully).
    # Compile to a pid-suffixed temp + atomic rename: multi-host runs start
    # several processes on one machine, and two concurrent `g++ -o` into the
    # same path corrupt the .so both then dlopen.
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    base = ["g++", "-O3", "-std=c++17", "-funroll-loops",
            "-shared", "-fPIC", "-o", tmp, _SRC]
    attempts = (["-march=native", "-fopenmp"], ["-fopenmp"], [])
    last = None
    try:
        for extra in attempts:
            proc = subprocess.run(base[:1] + extra + base[1:],
                                  capture_output=True, text=True)
            if proc.returncode == 0:
                os.replace(tmp, _LIB)
                return
            last = proc
    finally:
        # failed attempts must not leave partial pid-suffixed artifacts in
        # the package dir (os.replace above consumes tmp on success)
        if os.path.exists(tmp):
            os.unlink(tmp)
    raise RuntimeError(
        f"native CRF build failed (g++ rc={last.returncode}):\n{last.stderr}")


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.excel_dcrf_inference.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),     # image
            ctypes.POINTER(ctypes.c_float),     # probs
            ctypes.POINTER(ctypes.c_float),     # out
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        lib.excel_dcrf_inference.restype = None
        _lib = lib
        return lib


class DenseCRF:
    """Drop-in equivalent of the reference's DenseCRF (utils/dcrf.py:42-68)."""

    def __init__(self, iter_max: int = 10, pos_w: float = 3.0,
                 pos_xy_std: float = 1.0, bi_w: float = 4.0,
                 bi_xy_std: float = 67.0, bi_rgb_std: float = 3.0):
        self.iter_max = iter_max
        self.pos_w = pos_w
        self.pos_xy_std = pos_xy_std
        self.bi_w = bi_w
        self.bi_xy_std = bi_xy_std
        self.bi_rgb_std = bi_rgb_std

    def __call__(self, image: np.ndarray, probmap: np.ndarray) -> np.ndarray:
        lib = _load()
        c, h, w = probmap.shape
        assert image.shape == (h, w, 3), (image.shape, probmap.shape)
        img = np.ascontiguousarray(image, np.uint8)
        probs = np.ascontiguousarray(probmap, np.float32)
        out = np.empty_like(probs)
        lib.excel_dcrf_inference(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, c, self.iter_max,
            self.pos_w, self.pos_xy_std,
            self.bi_w, self.bi_xy_std, self.bi_rgb_std)
        return out


def crf_inference(img: np.ndarray, probs: np.ndarray, t: int = 10,
                  labels: int = 21) -> np.ndarray:
    """Hard-coded parameter set of the reference's crf_inference
    (utils/dcrf.py:7-24)."""
    del labels  # shape-derived
    crf = DenseCRF(iter_max=t, pos_w=3.0, pos_xy_std=3.0,
                   bi_w=10.0, bi_xy_std=80.0, bi_rgb_std=13.0)
    return crf(img, probs)


def crf_inference_label(img: np.ndarray, labels: np.ndarray, t: int = 10,
                        n_labels: int = 21, gt_prob: float = 0.7) -> np.ndarray:
    """Label-unary variant (utils/dcrf.py:26-40): unary_from_labels spreads
    1-gt_prob uniformly over the other classes; Gaussian sxy=3/compat=3 +
    bilateral sxy=50/srgb=5/compat=10; returns the argmax label map."""
    h, w = labels.shape
    probs = np.full((n_labels, h, w), (1.0 - gt_prob) / (n_labels - 1),
                    np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    probs[labels.astype(np.int64), ys, xs] = gt_prob
    crf = DenseCRF(iter_max=t, pos_w=3.0, pos_xy_std=3.0,
                   bi_w=10.0, bi_xy_std=50.0, bi_rgb_std=5.0)
    return crf(img, probs).argmax(0)


def crf_batch(items, crf: DenseCRF, num_threads: int = 2):
    """[(image, probmap), ...] -> [Q, ...] on a small thread pool (the C
    call releases the GIL via ctypes)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        return list(pool.map(lambda a: crf(*a), items))
