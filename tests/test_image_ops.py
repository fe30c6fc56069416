"""Image-op parity: PIL-exact resize, pad semantics, mask resize, normalize."""

import numpy as np
import pytest
from PIL import Image, ImageOps

import jax.numpy as jnp

from retr_tpu.ops import image as imops


@pytest.mark.parametrize("in_size,out_size", [((64, 48), (224, 224)), ((300, 500), (224, 224)),
                                              ((17, 101), (224, 224)), ((224, 224), (224, 224)),
                                              ((37, 37), (16, 16))])
def test_pil_resize_uint8_bit_exact(in_size, out_size, rng):
    h, w = in_size
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((out_size[1], out_size[0]), Image.BILINEAR))
    got = imops.pil_resize_uint8(img, out_size[0], out_size[1])
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("size", [(64, 48), (48, 64), (100, 37), (37, 100), (50, 50)])
def test_pad_uint8_matches_imageops_pad(size, rng):
    h, w = size
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    m = max(h, w)
    ref = np.asarray(ImageOps.pad(Image.fromarray(img), (m, m), centering=(0.5, 0.5), color=0))
    got = imops.pad_uint8_to_square(img)
    np.testing.assert_array_equal(got, ref)


def test_pad_mask_floor_ceil_semantics():
    # reference pad_mask_to_max (utils.py:242-256): floor leading / ceil trailing, True fill
    mask = np.zeros((4, 9), dtype=bool)
    out = imops.pad_mask_to_square(mask)
    assert out.shape == (9, 9)
    # diff=5 -> floor 2 leading / ceil 3 trailing on the row axis
    assert out[:2].all() and out[-3:].all()
    assert not out[2:6].any()


def test_image_vs_mask_pad_disagreement():
    # the reference quirk: diff % 4 == 3 -> image offset differs from mask offset by 1
    assert imops.pad_image_offset(3) == 2
    assert imops.pad_mask_offsets(3) == (1, 2)
    assert imops.pad_image_offset(5) == 2
    assert imops.pad_mask_offsets(5) == (2, 3)


def test_torch_bilinear_weights_match_torch_interpolate(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(1, 1, 33, 57)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(14, 14), mode="bilinear",
                        align_corners=False, antialias=False).numpy()[0, 0]
    wh = imops.torch_bilinear_weights(33, 14)
    ww = imops.torch_bilinear_weights(57, 14)
    got = np.asarray(imops.resize_float(jnp.asarray(x[0, 0]), jnp.asarray(wh), jnp.asarray(ww)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_mask_resize_nonzero_cast(rng):
    mask = rng.random((40, 40)) > 0.8
    wh = jnp.asarray(imops.torch_bilinear_weights(40, 14))
    got = np.asarray(imops.resize_mask_torch_semantics(jnp.asarray(mask), wh, wh))
    # every True output pixel must be reachable from some True input with weight > 0
    import torch
    import torch.nn.functional as F
    ref = F.interpolate(torch.from_numpy(mask).float()[None, None], size=(14, 14),
                        mode="bilinear", align_corners=False).numpy()[0, 0] != 0
    np.testing.assert_array_equal(got, ref)


def test_to_tensor_normalize(rng):
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    got = np.asarray(imops.to_tensor_normalize(jnp.asarray(img)))
    ref = (img.astype(np.float32).transpose(2, 0, 1) / 255.0
           - np.asarray(imops.IMAGENET_MEAN, np.float32)[:, None, None]) / \
        np.asarray(imops.IMAGENET_STD, np.float32)[:, None, None]
    np.testing.assert_allclose(got, ref, atol=1e-6)
    assert got.shape == (3, 8, 8)


def test_color_jitter_ranges(rng):
    import jax
    img = jnp.asarray(rng.integers(0, 256, (16, 16, 3)).astype(np.float32))
    out = imops.color_jitter(img, jax.random.key(0))
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
    out2 = imops.color_jitter(img, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))  # deterministic per key
    out3 = imops.color_jitter(img, jax.random.key(1))
    assert not np.allclose(np.asarray(out), np.asarray(out3))
