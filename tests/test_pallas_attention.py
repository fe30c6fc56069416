"""Pallas fused attention vs the XLA reference core (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retr_tpu.masking import key_padding_bias
from retr_tpu.models.layers import attention_core
from retr_tpu.ops.attention import fused_attention


def make_qkv(b=2, h=4, sq=37, sk=53, d=32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, sk, d), jnp.float32)
    return q, k, v


def test_fused_matches_xla_no_mask():
    q, k, v = make_qkv()
    ref, _ = attention_core(q, k, v, None)
    got = fused_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_matches_xla_key_padding():
    q, k, v = make_qkv(seed=1)
    pad = jax.random.bernoulli(jax.random.key(9), 0.3, (q.shape[0], k.shape[2]))
    pad = pad.at[:, 0].set(False)
    bias4 = key_padding_bias(pad)
    ref, _ = attention_core(q, k, v, bias4)
    got = fused_attention(q, k, v, bias4[:, 0, 0, :], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_matches_xla_causal_plus_padding():
    b, h, s, d = 2, 4, 24, 32
    q, k, v = make_qkv(b=b, h=h, sq=s, sk=s, d=d, seed=2)
    pad = jnp.zeros((b, s), bool).at[:, -5:].set(True)
    from retr_tpu.masking import causal_mask

    bias4 = causal_mask(s)[None, None] + key_padding_bias(pad)
    ref, _ = attention_core(q, k, v, bias4)
    got = fused_attention(q, k, v, key_padding_bias(pad)[:, 0, 0, :], causal=True, interpret=True)
    # rows whose keys are fully masked (none here: causal row i always sees key 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_bf16_inputs():
    q, k, v = make_qkv(seed=3)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref, _ = attention_core(q, k, v, None)
    got = fused_attention(qb, kb, vb, None, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )


def test_model_uses_pallas_path_equivalently():
    """Full transformer forward with cfg.use_pallas_attention in interpret mode ==
    XLA path (eval, no dropout)."""
    import retr_tpu.ops.attention as att_mod
    from retr_tpu.config import Config
    from retr_tpu.models import transformer

    cfg_x = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=2,
        dec_layers=2, dim_feedforward=128, vocab_size=96, max_position_embeddings=12,
        dropout=0.0, image_size=64, use_pallas_attention=False,
    )
    cfg_p = cfg_x.replace(use_pallas_attention=True)
    params = transformer.init(jax.random.key(0), cfg_x)

    b, s, t = 2, 10, cfg_x.max_position_embeddings
    src = jax.random.normal(jax.random.key(1), (b, cfg_x.hidden_dim, s))
    mask = jnp.zeros((b, s), bool).at[:, -2:].set(True)
    tgt = jax.random.randint(jax.random.key(2), (b, t), 0, cfg_x.vocab_size)
    tgt_mask = jnp.zeros((b, t), bool).at[:, 8:].set(True)

    ref, _ = transformer.forward(params, src, mask, None, None, tgt, tgt_mask, cfg_x)

    # route the pallas path through interpret mode for the CPU test
    att_mod.FORCE_INTERPRET = True
    try:
        got, _ = transformer.forward(params, src, mask, None, None, tgt, tgt_mask, cfg_p)
    finally:
        att_mod.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
