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
_TOK_SRC = os.path.join(_REPO_ROOT, "native", "tokenizer.cc")
_TOK_LIB = os.path.join(_REPO_ROOT, "native", "libretr_tokenizer.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_tok_lib: Optional[ctypes.CDLL] = None
_tok_tried = False


def _build(src: str = _SRC, lib: str = _LIB) -> bool:
    # -march=native lets the convolution saxpy loops auto-vectorize to the host's
    # widest ISA (AVX-512 on the bench hosts); results are bit-identical either way
    # (integer fixed-point), so the portable -O3 build is an equivalent fallback.
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", lib, src, "-lpthread"]
    for cmd in (base + ["-march=native"], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            return True
        except Exception:
            continue
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


# ---------------------------------------------------------------------------------
# Native WordPiece tokenizer (native/tokenizer.cc)
# ---------------------------------------------------------------------------------


def load_tokenizer_lib() -> Optional[ctypes.CDLL]:
    global _tok_lib, _tok_tried
    with _lock:
        if _tok_lib is not None or _tok_tried:
            return _tok_lib
        _tok_tried = True
        if not os.path.exists(_TOK_LIB) or os.path.getmtime(_TOK_LIB) < os.path.getmtime(_TOK_SRC):
            if not os.path.exists(_TOK_SRC) or not _build(_TOK_SRC, _TOK_LIB):
                return None
        try:
            lib = ctypes.CDLL(_TOK_LIB)
        except OSError:
            return None
        lib.retr_tok_create.argtypes = [ctypes.c_char_p]
        lib.retr_tok_create.restype = ctypes.c_void_p
        lib.retr_tok_destroy.argtypes = [ctypes.c_void_p]
        lib.retr_tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)
        ]
        lib.retr_tok_encode.restype = ctypes.c_int
        lib.retr_tok_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.retr_tok_encode_batch.restype = ctypes.c_int
        _tok_lib = lib
        return _tok_lib


class NativeWordPiece:
    """ctypes handle on the C++ WordPiece encoder (ASCII fast path)."""

    def __init__(self, vocab_path: str):
        lib = load_tokenizer_lib()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = lib
        self._handle = lib.retr_tok_create(vocab_path.encode())
        if not self._handle:
            raise RuntimeError(f"could not load vocab from {vocab_path}")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.retr_tok_destroy(self._handle)
            self._handle = None

    def encode(self, text: str, max_length: int):
        """Returns (ids padded to max_length as np.int32, true length)."""
        out = np.empty(max_length, np.int32)
        n = self._lib.retr_tok_encode(
            self._handle, text.encode(), max_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, int(n)

    def encode_batch(self, texts, max_length: int, n_threads: int = 4):
        bufs = [t.encode() + b"\0" for t in texts]
        blob = b"".join(bufs)
        offsets = np.zeros(len(texts), np.int64)
        pos = 0
        for i, b in enumerate(bufs):
            offsets[i] = pos
            pos += len(b)
        out = np.empty((len(texts), max_length), np.int32)
        lengths = np.empty(len(texts), np.int32)
        rc = self._lib.retr_tok_encode_batch(
            self._handle, blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(texts), max_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        if rc != 0:
            raise RuntimeError("retr_tok_encode_batch failed")
        return out, lengths
