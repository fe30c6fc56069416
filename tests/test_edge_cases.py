"""Edge cases: all-masked context (the reference's NaN hazard), bf16 mode, empty
captions, full-buffer decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retr_tpu import decode
from retr_tpu.config import Config
from retr_tpu.data.preprocess import preprocess_sample
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.masking import Masked, ensure_unmasked_values
from retr_tpu.models import caption


def tiny_cfg(**kw):
    base = dict(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=96, max_position_embeddings=10,
        dropout=0.0, image_size=32,
    )
    base.update(kw)
    return Config(**base)


def test_ensure_unmasked_deterministic_and_effective():
    mask = jnp.ones((2, 4, 4), bool).at[0, 0, 0].set(False)  # sample 1 fully masked
    out1 = ensure_unmasked_values(mask, jax.random.key(1))
    out2 = ensure_unmasked_values(mask, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # sample 0 untouched, sample 1 got some False positions
    assert not out1[0, 0, 0]
    assert (~np.asarray(out1[1])).sum() >= 1
    # different key -> different filler
    out3 = ensure_unmasked_values(mask, jax.random.key(2))
    assert not np.array_equal(np.asarray(out1[1]), np.asarray(out3[1]))


@pytest.mark.slow
def test_global_variant_whole_image_bbox_no_nan(rng):
    """bbox covering the whole image -> context fully blanked + fully masked; the
    deterministic unmask guard must keep the forward finite (reference hazard:
    models/utils.py:60-89, caption.py:144)."""
    tok, _, _ = prepare_tokenizer()
    cfg = tiny_cfg(use_global_features=True, use_location_features=True,
                   vocab_size=tok.vocab_size)
    params, _ = caption.build_model(cfg, jax.random.key(0))

    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    s = preprocess_sample(
        img, [0, 0, 40, 40], "the thing", tok,
        image_size=cfg.image_size, max_length=cfg.max_position_embeddings,
        use_global=True, use_location=True,
    )
    assert s.context_mask.all()  # fully masked context

    t = cfg.max_position_embeddings
    logits = caption.forward(
        params, cfg,
        Masked(jnp.asarray(s.target_image.transpose(2, 0, 1)[None], jnp.float32),
               jnp.asarray(s.target_mask[None])),
        jnp.asarray(s.caption_ids[None, :t]), jnp.asarray(s.caption_mask[None, :t]),
        global_samples=Masked(
            jnp.asarray(s.context_image.transpose(2, 0, 1)[None], jnp.float32),
            jnp.asarray(s.context_mask[None]),
        ),
        loc_feats=jnp.asarray(s.loc_feats[None]),
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_bf16_mode_runs():
    cfg = tiny_cfg()
    params, _ = caption.build_model(cfg, jax.random.key(1))
    img = jax.random.normal(jax.random.key(2), (2, 3, 32, 32))
    samples = Masked(img, jnp.zeros((2, 32, 32), bool))
    ids = decode.greedy(
        params, cfg, samples, max_len=8, bos_token=90, eos_token=91,
        compute_dtype=jnp.bfloat16,
    )
    assert np.asarray(ids).shape == (2, 8)


def test_decode_never_early_exits_with_unreachable_eos():
    cfg = tiny_cfg()
    params, _ = caption.build_model(cfg, jax.random.key(3))
    img = jax.random.normal(jax.random.key(4), (2, 3, 32, 32))
    samples = Masked(img, jnp.zeros((2, 32, 32), bool))
    ids = np.asarray(decode.greedy(
        params, cfg, samples, max_len=10, bos_token=90, eos_token=cfg.vocab_size + 1
    ))
    # all 10 slots written (BOS + 9 tokens)
    assert (ids != 0).all()


def test_empty_caption_tokenizes():
    tok, _, _ = prepare_tokenizer()
    enc = tok.encode_plus("", max_length=8)
    assert enc["input_ids"][:2] == [101, 102]
    assert sum(enc["attention_mask"]) == 2
