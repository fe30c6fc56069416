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


# ---------------------------------------------------------------------------------
# Native WordPiece tokenizer vs the Python spec
# ---------------------------------------------------------------------------------


def test_native_tokenizer_matches_python(rng):
    from retr_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.synthetic(
        ["hello", "world", "tokenization", "running", "dog", "red"]
    )
    nat = tok._native_encoder()
    assert nat is not None

    texts = [
        "Hello, WORLD!",
        "the RED dog runs... fast?",
        "tokenization tokenization's",
        "a b c d e f g h i j k l m n o p",  # truncation case
        "",
        "!!!",
        "word\twith\ttabs and  spaces",
    ]
    for text in texts:
        # python reference path (bypass the native fast path)
        ids_py = tok.encode(text, max_length=12)
        ids_py = ids_py + [tok.vocab[tok.PAD]] * (12 - len(ids_py))
        ids_nat, n = nat.encode(text, 12)
        assert ids_nat.tolist() == ids_py, text


def test_native_tokenizer_batch(rng):
    from retr_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.synthetic(["alpha", "beta", "gamma"])
    nat = tok._native_encoder()
    texts = ["alpha beta", "GAMMA alpha!", "beta"] * 5
    out, lengths = nat.encode_batch(texts, 10, n_threads=3)
    for i, t in enumerate(texts):
        single, n = nat.encode(t, 10)
        assert out[i].tolist() == single.tolist()
        assert lengths[i] == n


def test_encode_plus_uses_native_and_matches(rng):
    from retr_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.synthetic(["cat", "sat", "mat"])
    enc = tok.encode_plus("The cat sat on the mat", max_length=16)
    # force-python comparison
    tok2 = WordPieceTokenizer(tok.vocab)
    tok2._native = False
    enc2 = tok2.encode_plus("The cat sat on the mat", max_length=16)
    assert enc["input_ids"] == enc2["input_ids"]
    assert enc["attention_mask"] == enc2["attention_mask"]
