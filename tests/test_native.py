"""Native C++ preprocessing core vs the numpy executable spec (bit-exact)."""

import numpy as np
import pytest

from retr_tpu import native
from retr_tpu.ops import image as imops

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@pytest.mark.parametrize("shape", [(64, 48), (48, 64), (37, 123), (224, 224), (260, 180)])
def test_image_path_bit_exact(shape, rng):
    h, w = shape
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ref = imops.pil_resize_uint8(imops.pad_uint8_to_square(img), 224, 224)
    got = native.pad_resize_image(img, 224)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape", [(64, 48), (48, 64), (50, 50), (123, 37)])
def test_mask_path_bit_exact(shape, rng):
    h, w = shape
    mask = rng.random((h, w)) > 0.8
    sq = imops.pad_mask_to_square(mask)
    m = sq.shape[0]
    wmat = imops.torch_bilinear_weights(m, 14)
    ref = (wmat @ sq.astype(np.float64) @ wmat.T) != 0.0
    got = native.pad_resize_mask(mask, 14)
    np.testing.assert_array_equal(got, ref)


def test_batch_api_matches_single(rng):
    images = [rng.integers(0, 256, (rng.integers(40, 120), rng.integers(40, 120), 3),
                           dtype=np.uint8) for _ in range(6)]
    batch = native.pad_resize_image_batch(images, 64, n_threads=3)
    for i, im in enumerate(images):
        np.testing.assert_array_equal(batch[i], native.pad_resize_image(im, 64))


def test_pil_agreement(rng):
    """End-to-end: native path == actual PIL for a non-square image."""
    from PIL import Image, ImageOps

    img = rng.integers(0, 256, (90, 130, 3), dtype=np.uint8)
    padded = ImageOps.pad(Image.fromarray(img), (130, 130), centering=(0.5, 0.5), color=0)
    ref = np.asarray(padded.resize((64, 64), Image.BILINEAR))
    got = native.pad_resize_image(img, 64)
    np.testing.assert_array_equal(got, ref)
