"""Image preprocessing as TPU-friendly linear algebra.

The reference's input pipeline is PIL/torchvision C code (data_utils/refcoco.py:14-46,
147-171: ImageOps.pad -> Resize(224, bilinear) -> ToTensor -> Normalize, with
crop_image_to_bb / pad_mask_to_max in data_utils/utils.py:161-256). Here every resize
is a pair of precomputed weight matrices applied as matmuls —
``out = W_h @ img @ W_w^T`` — which XLA fuses with the subsequent normalize into a
single MXU-friendly kernel, instead of per-pixel C loops:

- :func:`pil_resize_weights` reproduces PIL's antialiased triangle-filter coefficient
  computation (support scaled by the downsampling factor, Pillow's half-pixel
  mapping);
- :func:`pil_resize_uint8` additionally emulates Pillow's 8-bit fixed-point path
  (integer coefficients at PRECISION_BITS, per-pass rounding + clipping) so resized
  uint8 images are **bit-exact** with PIL — the #1 greedy-parity risk named in
  SURVEY.md §7;
- :func:`torch_bilinear_weights` reproduces torch ``F.interpolate(bilinear,
  antialias=False, align_corners=False)`` for the mask-resize path
  (refcoco.py:151-152 resizes the bool mask through torchvision's tensor kernel);
- pad offset helpers replicate ImageOps.pad's banker's-round centering
  (utils.py:231-239) AND pad_mask_to_max's floor/ceil centering (utils.py:242-256) —
  including the reference's quirk that the two disagree by one pixel when the
  dimension difference is ≡ 3 (mod 4).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c fixed-point precision for 8bpc

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------------
# Weight-matrix builders (host-side, float64 — these are compile-time constants or
# small per-batch arrays; the heavy lifting is the on-device matmuls)
# ---------------------------------------------------------------------------------


def pil_resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] PIL BILINEAR (antialiased triangle) coefficients, normalized rows."""
    w = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # bilinear filter support = 1
    inv = 1.0 / filterscale
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax, dtype=np.float64)
        k = 1.0 - np.abs((xs - center + 0.5) * inv)
        k = np.clip(k, 0.0, None)
        ssum = k.sum()
        if ssum != 0:
            k /= ssum
        w[xx, xmin:xmax] = k
    return w


def _quantize_coeffs(w: np.ndarray) -> np.ndarray:
    """Pillow's double->int coefficient conversion (round-half-away-from-zero)."""
    scaled = w * (1 << PRECISION_BITS)
    return np.where(scaled < 0, scaled - 0.5, scaled + 0.5).astype(np.int64)


def torch_bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] torch bilinear (antialias=False, align_corners=False): 2 taps/row,
    src = (dst + 0.5) * in/out - 0.5 clamped into range."""
    w = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    for xx in range(out_size):
        src = max((xx + 0.5) * scale - 0.5, 0.0)
        x0 = min(int(math.floor(src)), in_size - 1)
        x1 = min(x0 + 1, in_size - 1)
        frac = src - x0
        w[xx, x0] += 1.0 - frac
        w[xx, x1] += frac
    return w


# ---------------------------------------------------------------------------------
# Apply (host numpy for exact uint8; jnp float path for on-device fused pipelines)
# ---------------------------------------------------------------------------------


def pil_resize_uint8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bit-exact emulation of PIL Image.resize(..., BILINEAR) on a uint8 HWC image:
    horizontal pass then vertical pass, int fixed-point accumulate, round, clip."""
    in_h, in_w = img.shape[:2]
    kw = _quantize_coeffs(pil_resize_weights(in_w, out_w))  # [out_w, in_w]
    kh = _quantize_coeffs(pil_resize_weights(in_h, out_h))  # [out_h, in_h]
    half = 1 << (PRECISION_BITS - 1)

    x = img.astype(np.int64)                       # [H, W, C]
    # horizontal: [H, out_w, C]
    acc = np.einsum("hwc,ow->hoc", x, kw) + half
    x = np.clip(acc >> PRECISION_BITS, 0, 255)
    # vertical: [out_h, out_w, C]
    acc = np.einsum("hwc,oh->owc", x, kh) + half
    return np.clip(acc >> PRECISION_BITS, 0, 255).astype(np.uint8)


def resize_float(img: jax.Array, wh: jax.Array, ww: jax.Array) -> jax.Array:
    """Float resize as two matmuls: img [..., H, W] -> [..., out_h, out_w]."""
    return jnp.einsum("oh,...hw,pw->...op", wh, img, ww)


def resize_mask_torch_semantics(mask: jax.Array, wh: jax.Array, ww: jax.Array) -> jax.Array:
    """Reference mask resize (refcoco.py:151-152): bool -> float -> torchvision
    bilinear -> cast back to bool (nonzero => True)."""
    f = resize_float(mask.astype(jnp.float32), wh, ww)
    return f != 0.0


# ---------------------------------------------------------------------------------
# Padding offsets
# ---------------------------------------------------------------------------------


def pad_image_offset(diff: int) -> int:
    """ImageOps.pad centering=(0.5, 0.5): offset = round(diff * 0.5), Python banker's
    rounding (utils.py:231-239 via PIL.ImageOps.pad)."""
    return round(diff * 0.5)


def pad_mask_offsets(diff: int) -> Tuple[int, int]:
    """pad_mask_to_max: floor(diff/2) leading, ceil(diff/2) trailing
    (utils.py:242-256). NOTE: disagrees with pad_image_offset by 1 when
    diff % 4 == 3 — a reference quirk we keep for parity."""
    return math.floor(diff / 2), math.ceil(diff / 2)


def pad_uint8_to_square(img: np.ndarray, fill: int = 0) -> np.ndarray:
    """pad_img_to_max (utils.py:231-239): black square canvas, PIL centering."""
    h, w = img.shape[:2]
    m = max(h, w)
    if h == w:
        return img
    out = np.full((m, m) + img.shape[2:], fill, dtype=img.dtype)
    if w < m:
        x = pad_image_offset(m - w)
        out[:, x : x + w] = img
    else:
        y = pad_image_offset(m - h)
        out[y : y + h, :] = img
    return out


def pad_mask_to_square(mask: np.ndarray) -> np.ndarray:
    """pad_mask_to_max (utils.py:242-256): pad shorter axis with True, floor/ceil."""
    h, w = mask.shape
    if h == w:
        return mask
    m = max(h, w)
    out = np.ones((m, m), dtype=bool)
    if w < m:
        lead, _ = pad_mask_offsets(m - w)
        out[:, lead : lead + w] = mask
    else:
        lead, _ = pad_mask_offsets(m - h)
        out[lead : lead + h, :] = mask
    return out


# ---------------------------------------------------------------------------------
# Normalization + augmentation (device-side)
# ---------------------------------------------------------------------------------


def to_tensor_normalize(img_u8: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    """ToTensor + Normalize (refcoco.py:32-41): HWC uint8 -> CHW f32 normalized."""
    x = img_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)[:, None, None]
    std = jnp.asarray(std, jnp.float32)[:, None, None]
    chw = jnp.moveaxis(x, -1, -3)
    return (chw - mean) / std


def color_jitter(
    img_u8: jax.Array,
    key: jax.Array,
    brightness=(0.5, 1.3),
    contrast=(0.8, 1.5),
    saturation=(0.2, 1.5),
) -> jax.Array:
    """torchvision ColorJitter equivalent (refcoco.py:28-35): random factors in the
    reference's ranges, applied in a random order (torchvision permutes the enabled
    ops). PIL's uint8 enhance arithmetic is matched at float precision — augmentation
    is random, so distributional fidelity is what parity requires here.

    Input/output: [H, W, 3] float in [0, 255].
    """
    kb, kc, ks, kp = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=brightness[0], maxval=brightness[1])
    fc = jax.random.uniform(kc, (), minval=contrast[0], maxval=contrast[1])
    fs = jax.random.uniform(ks, (), minval=saturation[0], maxval=saturation[1])

    def gray(x):  # PIL convert("L") weights
        return x[..., 0] * 0.299 + x[..., 1] * 0.587 + x[..., 2] * 0.114

    def apply_brightness(x):
        return jnp.clip(x * fb, 0.0, 255.0)

    def apply_contrast(x):
        mean = jnp.round(jnp.mean(gray(x)))  # ImageEnhance.Contrast: mean of L
        return jnp.clip(mean + (x - mean) * fc, 0.0, 255.0)

    def apply_saturation(x):
        g = gray(x)[..., None]
        return jnp.clip(g + (x - g) * fs, 0.0, 255.0)

    fns = [apply_brightness, apply_contrast, apply_saturation]
    perm = jax.random.permutation(kp, 3)

    x = img_u8.astype(jnp.float32)
    for i in range(3):
        x = jax.lax.switch(perm[i], fns, x)
    return x
