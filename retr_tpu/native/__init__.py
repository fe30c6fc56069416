"""ctypes bindings for the native preprocessing core (native/preprocess.cc).

The shared library is built on demand with g++ (no pip/pybind dependency); if the
toolchain is unavailable the callers fall back to the numpy implementations in
retr_tpu.ops.image, which are the executable spec the native code must bit-match.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "preprocess.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libretr_preprocess.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.retr_pad_resize_image.argtypes = [u8p] + [ctypes.c_int] * 4 + [u8p]
        lib.retr_pad_resize_image.restype = ctypes.c_int
        lib.retr_pad_resize_mask.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p]
        lib.retr_pad_resize_mask.restype = ctypes.c_int
        lib.retr_pad_resize_batch.argtypes = [
            u8p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int,
        ]
        lib.retr_pad_resize_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pad_resize_image(img: np.ndarray, out_size: int) -> np.ndarray:
    """uint8 HWC -> [out, out, C] uint8; pad-to-square + PIL-exact resize."""
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    dst = np.empty((out_size, out_size, c), np.uint8)
    rc = lib.retr_pad_resize_image(_u8ptr(img), h, w, c, out_size, _u8ptr(dst))
    if rc != 0:
        raise RuntimeError(f"retr_pad_resize_image failed rc={rc}")
    return dst


def pad_resize_mask(mask: np.ndarray, out_size: int) -> np.ndarray:
    """bool [H, W] -> [out, out] bool with the reference's mask-resize semantics."""
    lib = load()
    assert lib is not None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    dst = np.empty((out_size, out_size), np.uint8)
    rc = lib.retr_pad_resize_mask(_u8ptr(m), h, w, out_size, _u8ptr(dst))
    if rc != 0:
        raise RuntimeError(f"retr_pad_resize_mask failed rc={rc}")
    return dst.astype(bool)


def pad_resize_image_batch(images, out_size: int, n_threads: int = 4) -> np.ndarray:
    """List of variable-size uint8 HWC images -> [N, out, out, C] uint8."""
    lib = load()
    assert lib is not None
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    c = images[0].shape[2]
    data = np.concatenate([im.reshape(-1) for im in images])
    offsets = np.zeros(len(images), np.int64)
    pos = 0
    for i, im in enumerate(images):
        offsets[i] = pos
        pos += im.size
    heights = np.asarray([im.shape[0] for im in images], np.int32)
    widths = np.asarray([im.shape[1] for im in images], np.int32)
    dst = np.empty((len(images), out_size, out_size, c), np.uint8)
    rc = lib.retr_pad_resize_batch(
        _u8ptr(data),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(images), c, out_size, _u8ptr(dst), n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"retr_pad_resize_batch failed rc={rc}")
    return dst
