"""Transformer parity vs torch (nn.MultiheadAttention-based oracle) + sine table."""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from retr_tpu.config import Config
from retr_tpu.masking import causal_mask
from retr_tpu.models import layers, torch_import, transformer
from retr_tpu.models.positional import sine_table
from tests import torch_oracle


def tiny_cfg(**kw):
    base = dict(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=2,
        dec_layers=2, dim_feedforward=128, vocab_size=96, max_position_embeddings=12,
        dropout=0.0, image_size=64,
    )
    base.update(kw)
    return Config(**base)


def test_sine_table_matches_torch():
    ref = torch_oracle.sine_table(64, 100).numpy()
    got = np.asarray(sine_table(64, 100))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_causal_mask_matches_torch():
    ref = torch_oracle.square_subsequent_mask(7).numpy()
    got = np.asarray(causal_mask(7))
    np.testing.assert_array_equal(got, ref)


def test_mha_parity():
    torch.manual_seed(3)
    d, h, b, s = 64, 4, 2, 9
    tm = torch.nn.MultiheadAttention(d, h)  # seq-first
    state = {f"sublayer.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    p = torch_import._mha(state, "sublayer")

    q = torch.randn(s, b, d)
    kpm = torch.rand(b, s) > 0.7
    kpm[:, 0] = False  # keep at least one key
    with torch.no_grad():
        ref_out, ref_w = tm(q, q, q, key_padding_mask=kpm)

    from retr_tpu.masking import key_padding_bias
    qj = jnp.asarray(q.numpy()).transpose(1, 0, 2)  # [B, S, E]
    bias = key_padding_bias(jnp.asarray(kpm.numpy()))
    out, w = layers.multi_head_attention(p, qj, qj, qj, num_heads=h, bias=bias, need_weights=True)

    np.testing.assert_allclose(np.asarray(out), ref_out.numpy().transpose(1, 0, 2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=1e-5)


def build_oracle_and_params(cfg, seed=0):
    torch.manual_seed(seed)
    tm = torch_oracle.ConcatTransformer(
        vocab=cfg.vocab_size, d=cfg.hidden_dim, h=cfg.nheads, nenc=cfg.enc_layers,
        ndec=cfg.dec_layers, dff=cfg.dim_feedforward, max_pos=cfg.max_position_embeddings,
        pad_id=cfg.pad_token_id, ln_eps=cfg.layer_norm_eps, dropout=0.0,
        pre_norm=cfg.pre_norm,
    ).eval()
    state = {f"transformer.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    params = torch_import.import_transformer(state, cfg)
    return tm, params


def test_transformer_forward_parity():
    cfg = tiny_cfg()
    tm, params = build_oracle_and_params(cfg)

    b, s, t = 2, 10, cfg.max_position_embeddings
    torch.manual_seed(10)
    src = torch.randn(b, cfg.hidden_dim, s)
    mask = torch.rand(b, s) > 0.8
    mask[:, 0] = False
    tgt = torch.randint(0, cfg.vocab_size, (b, t))
    tgt_mask = torch.zeros(b, t, dtype=torch.bool)
    tgt_mask[:, 7:] = True

    with torch.no_grad():
        ref = tm(src, mask, tgt, tgt_mask).numpy().transpose(1, 0, 2)  # [B, T, C]

    got, _ = transformer.forward(
        params, jnp.asarray(src.numpy()), jnp.asarray(mask.numpy()), None, None,
        jnp.asarray(tgt.numpy()), jnp.asarray(tgt_mask.numpy()), cfg,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_transformer_concat_context_parity():
    cfg = tiny_cfg()
    tm, params = build_oracle_and_params(cfg, seed=4)

    b, s, sc, t = 2, 6, 8, cfg.max_position_embeddings
    torch.manual_seed(11)
    src = torch.randn(b, cfg.hidden_dim, s)
    src_c = torch.randn(b, cfg.hidden_dim, sc)
    mask = torch.zeros(b, s, dtype=torch.bool)
    mask_c = torch.rand(b, sc) > 0.7
    mask_c[:, 0] = False
    tgt = torch.randint(0, cfg.vocab_size, (b, t))
    tgt_mask = torch.zeros(b, t, dtype=torch.bool)

    with torch.no_grad():
        ref = tm(src, mask, tgt, tgt_mask, src_c=src_c, mask_c=mask_c).numpy().transpose(1, 0, 2)

    got, _ = transformer.forward(
        params, jnp.asarray(src.numpy()), jnp.asarray(mask.numpy()),
        jnp.asarray(src_c.numpy()), jnp.asarray(mask_c.numpy()),
        jnp.asarray(tgt.numpy()), jnp.asarray(tgt_mask.numpy()), cfg,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_attention_maps_parity():
    cfg = tiny_cfg(enc_layers=1, dec_layers=1)
    tm, params = build_oracle_and_params(cfg, seed=5)
    b, s, t = 1, 5, cfg.max_position_embeddings
    torch.manual_seed(12)
    src = torch.randn(b, cfg.hidden_dim, s)
    mask = torch.zeros(b, s, dtype=torch.bool)
    tgt = torch.randint(0, cfg.vocab_size, (b, t))
    tgt_mask = torch.zeros(b, t, dtype=torch.bool)
    with torch.no_grad():
        _, ref_atts = tm(src, mask, tgt, tgt_mask, return_attention=True)
    _, atts = transformer.forward(
        params, jnp.asarray(src.numpy()), jnp.asarray(mask.numpy()), None, None,
        jnp.asarray(tgt.numpy()), jnp.asarray(tgt_mask.numpy()), cfg, return_attention=True,
    )
    assert set(atts) == {"enc_tc_self_att", "dec_exp_self_att", "dec_exp_tc_cross_att"}
    for k in atts:
        np.testing.assert_allclose(np.asarray(atts[k]), ref_atts[k].numpy(), atol=1e-5)


def test_incremental_decode_matches_full():
    """KV-cached step decode == full-buffer decode at each position (the equivalence
    the reference's recompute-everything greedy relies on; SURVEY.md §7 hard part 2)."""
    cfg = tiny_cfg()
    _, params = build_oracle_and_params(cfg, seed=6)

    b, s, t = 2, 7, cfg.max_position_embeddings
    key = jax.random.key(0)
    src = jax.random.normal(key, (b, s, cfg.hidden_dim))
    mask = jnp.zeros((b, s), dtype=bool)
    tgt = jax.random.randint(jax.random.key(1), (b, t), 0, cfg.vocab_size)

    memory, pos, _ = transformer.encode(params, src, mask, cfg)

    # full decode with the reference's greedy-style padding mask at position i:
    cache, cross = transformer.init_decode_state(params, memory, mask, pos, cfg, t)
    step_outs = []
    for i in range(t):
        out, cache = transformer.decode_step(params, cache, cross, tgt[:, i], jnp.int32(i), cfg)
        step_outs.append(out)
    inc = jnp.stack(step_outs, axis=1)  # [B, T, C]

    # reference semantics: at step i the full decoder runs with positions > i padded;
    # position i's output must match the incremental step.
    for i in [0, 3, t - 1]:
        pad = jnp.arange(t)[None, :] > i
        full, _ = transformer.decode_full(
            params, memory, mask, pos, tgt, jnp.broadcast_to(pad, (b, t)), cfg
        )
        np.testing.assert_allclose(
            np.asarray(inc[:, i]), np.asarray(full[:, i]), atol=2e-5,
            err_msg=f"incremental decode diverges at position {i}",
        )


def test_learned_positional_encoding_path():
    """position_embedding='learned' (reference position_encoding.py:38-63) builds a
    trainable source-pos table and runs through forward."""
    cfg = tiny_cfg(position_embedding="learned")
    params = transformer.init(jax.random.key(7), cfg)
    assert "src_pos" in params
    b, s, t = 2, 9, cfg.max_position_embeddings
    src = jax.random.normal(jax.random.key(8), (b, cfg.hidden_dim, s))
    mask = jnp.zeros((b, s), bool)
    tgt = jax.random.randint(jax.random.key(9), (b, t), 0, cfg.vocab_size)
    out, _ = transformer.forward(
        params, src, mask, None, None, tgt, jnp.zeros((b, t), bool), cfg
    )
    assert out.shape == (b, t, cfg.hidden_dim)
