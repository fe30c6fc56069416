"""Fused decode-step kernels vs the XLA path (interpret mode) + e2e equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retr_tpu.config import Config
from retr_tpu.masking import key_padding_bias
from retr_tpu.models import layers, transformer
from retr_tpu.ops import decoder_kernels as dk


def test_ff_block_kernel_matches_xla():
    key = jax.random.key(0)
    p = {
        "norm": layers.layer_norm_init(64),
        "lin1": layers.xavier_linear_init(jax.random.fold_in(key, 1), 64, 128),
        "lin2": layers.xavier_linear_init(jax.random.fold_in(key, 2), 128, 64),
    }
    p["norm"]["scale"] = p["norm"]["scale"] * 1.1 + 0.05
    x = jax.random.normal(jax.random.fold_in(key, 3), (8, 64))

    ref = x + layers.linear(p["lin2"], jax.nn.relu(layers.linear(p["lin1"], layers.layer_norm(p["norm"], x))))
    got = dk.ff_block(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    # batch-gridded path (b > one block): identical per-row results, any b % 8
    for b in (256, 40):  # 256 -> bb=128 two programs; 40 -> bb=8 five programs
        xb = jax.random.normal(jax.random.fold_in(key, 4), (b, 64))
        refb = xb + layers.linear(
            p["lin2"], jax.nn.relu(layers.linear(p["lin1"], layers.layer_norm(p["norm"], xb))))
        gotb = dk.ff_block(p, xb, interpret=True)
        np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb), atol=2e-6)
    assert dk._ff_batch_block(256) == 128 and dk._ff_batch_block(40) == 8
    assert dk._ff_batch_block(384) == 128 and dk._ff_batch_block(768) == 128


def test_cross_attn_block_kernel_matches_xla():
    key = jax.random.key(1)
    c, h, s, b = 64, 4, 23, 8
    p = {"norm": layers.layer_norm_init(c), "mha": layers.mha_init(jax.random.fold_in(key, 0), c)}
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, c))
    qpos = jax.random.normal(jax.random.fold_in(key, 2), (c,))
    k = jax.random.normal(jax.random.fold_in(key, 3), (b, h, s, c // h))
    v = jax.random.normal(jax.random.fold_in(key, 4), (b, h, s, c // h))
    pad = jax.random.bernoulli(jax.random.fold_in(key, 5), 0.3, (b, s))
    pad = pad.at[:, 0].set(False)
    bias4 = key_padding_bias(pad)

    # XLA reference: the cross-attn block from decode_step
    nq = layers.layer_norm(p["norm"], x[:, None, :])
    qc = layers.split_heads(layers.linear(p["mha"]["q"], nq + qpos[None, None, :]), h)
    outc, _ = layers.attention_core(qc, k, v, bias4)
    ref = x + layers.linear(p["mha"]["out"], layers.merge_heads(outc))[:, 0, :]

    got = dk.cross_attn_block(p, x, qpos, k, v, bias4[:, 0, 0, :], num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)


def test_decode_step_with_kernels_matches_xla_path():
    cfg_x = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, dim_feedforward=128, vocab_size=96, max_position_embeddings=10,
        dropout=0.0, image_size=32, use_pallas_decode=False,
    )
    cfg_p = cfg_x.replace(use_pallas_decode=True)
    params = transformer.init(jax.random.key(2), cfg_x)

    b, s, t = 2, 7, cfg_x.max_position_embeddings
    memory = jax.random.normal(jax.random.key(3), (b, s, cfg_x.hidden_dim))
    mask = jnp.zeros((b, s), bool).at[:, -1:].set(True)
    pos = jax.random.normal(jax.random.key(4), (s, cfg_x.hidden_dim))
    tgt = jax.random.randint(jax.random.key(5), (b, t), 0, cfg_x.vocab_size)

    def run(cfg):
        cache, cross = transformer.init_decode_state(params, memory, mask, pos, cfg, t)
        outs = []
        for i in range(4):
            out, cache = transformer.decode_step(params, cache, cross, tgt[:, i], jnp.int32(i), cfg)
            outs.append(out)
        return jnp.stack(outs)

    ref = run(cfg_x)
    dk.FORCE_INTERPRET = True
    try:
        got = run(cfg_p)
    finally:
        dk.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_self_attn_block_kernel_matches_xla():
    key = jax.random.key(7)
    c, h, t, b = 64, 4, 12, 8
    d = c // h
    p = {"norm": layers.layer_norm_init(c), "mha": layers.mha_init(jax.random.fold_in(key, 0), c)}
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, c))
    qpos = jax.random.normal(jax.random.fold_in(key, 2), (c,))
    # pre-filled caches for positions < step
    step = 5
    kc_std = jax.random.normal(jax.random.fold_in(key, 3), (b, h, t, d))
    vc_std = jax.random.normal(jax.random.fold_in(key, 4), (b, h, t, d))
    zero_tail = jnp.arange(t)[None, None, :, None] >= step
    kc_std = jnp.where(zero_tail, 0.0, kc_std)
    vc_std = jnp.where(zero_tail, 0.0, vc_std)

    # XLA reference (decode_step self-attn branch)
    from retr_tpu.masking import NEG_INF

    nx = layers.layer_norm(p["norm"], x[:, None, :])
    qk_in = nx + qpos[None, None, :]
    q = layers.split_heads(layers.linear(p["mha"]["q"], qk_in), h)
    k_new = layers.split_heads(layers.linear(p["mha"]["k"], qk_in), h)
    v_new = layers.split_heads(layers.linear(p["mha"]["v"], nx), h)
    kc2 = kc_std.at[:, :, step, :].set(k_new[:, :, 0, :])
    vc2 = vc_std.at[:, :, step, :].set(v_new[:, :, 0, :])
    bias = jnp.where(jnp.arange(t)[None, None, None, :] <= step, 0.0, NEG_INF)
    out, _ = layers.attention_core(q, kc2, vc2, bias)
    ref = x + layers.linear(p["mha"]["out"], layers.merge_heads(out))[:, 0, :]

    # pallas path (head-major [H, B, D, T] cache layout)
    kc_p = kc_std.transpose(1, 0, 3, 2)
    vc_p = vc_std.transpose(1, 0, 3, 2)
    got, kc_o, vc_o = dk.self_attn_block(
        p, x, qpos, kc_p, vc_p, jnp.int32(step), num_heads=h, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-6)
    np.testing.assert_allclose(np.asarray(kc_o), np.asarray(kc2.transpose(1, 0, 3, 2)), atol=3e-6)
    np.testing.assert_allclose(np.asarray(vc_o), np.asarray(vc2.transpose(1, 0, 3, 2)), atol=3e-6)


@pytest.mark.slow
def test_beam_with_pallas_layout_matches_xla(rng):
    """Beam search with the head-major cache layout (pallas path, interpret mode on
    CPU) must produce the same hypotheses as the XLA path."""
    import numpy as _np

    from retr_tpu import decode
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption

    cfg_x = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=96, max_position_embeddings=6,
        dropout=0.0, image_size=32, use_pallas_decode=False,
    )
    cfg_p = cfg_x.replace(use_pallas_decode=True)
    params, _ = caption.build_model(cfg_x, jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (4, 3, 32, 32))
    samples = Masked(img, jnp.zeros((4, 32, 32), bool))
    kw = dict(max_len=6, bos_token=90, eos_token=91, beam_size=2)

    t_x, s_x = decode.beam_search(params, cfg_x, samples, **kw)
    dk.FORCE_INTERPRET = True
    try:
        # batch*beams = 8 >= 8 -> pallas-eligible
        t_p, s_p = decode.beam_search(params, cfg_p, samples, **kw)
    finally:
        dk.FORCE_INTERPRET = False
    _np.testing.assert_array_equal(_np.asarray(t_x), _np.asarray(t_p))
    _np.testing.assert_allclose(_np.asarray(s_x), _np.asarray(s_p), atol=1e-5)


def test_mlp_head_argmax_matches_xla(rng):
    from retr_tpu.models import layers as L

    key = jax.random.key(11)
    c = 64
    p = {
        "layers": [
            L.torch_linear_init(jax.random.fold_in(key, 0), c, 96),
            L.torch_linear_init(jax.random.fold_in(key, 1), 96, 96),
            L.torch_linear_init(jax.random.fold_in(key, 2), 96, 5000),  # non-2048-multiple vocab
        ]
    }
    x = jax.random.normal(jax.random.fold_in(key, 3), (8, c))
    from retr_tpu.models.caption import mlp_head

    ref = jnp.argmax(mlp_head(p, x), axis=-1).astype(jnp.int32)
    got = dk.mlp_head_argmax(p, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mlp_head_topk_matches_xla(rng):
    """Fused beam head tail (top-k + logsumexp over vocab blocks) vs the flat XLA
    reference: token ids exactly equal (raw-logit selection, first-index ties);
    log-softmax scores equal up to logsumexp summation association."""
    from retr_tpu.models import layers as L
    from retr_tpu.models.caption import mlp_head

    key = jax.random.key(12)
    c, k = 64, 5
    p = {
        "layers": [
            L.torch_linear_init(jax.random.fold_in(key, 0), c, 96),
            L.torch_linear_init(jax.random.fold_in(key, 1), 96, 96),
            L.torch_linear_init(jax.random.fold_in(key, 2), 96, 5000),  # non-2048-multiple
        ]
    }
    x = jax.random.normal(jax.random.fold_in(key, 3), (16, c))

    logits = mlp_head(p, x).astype(jnp.float32)
    ref_vals, ref_tokens = jax.lax.top_k(logits, k)
    m = jnp.max(logits, axis=-1, keepdims=True)
    log_z = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    ref_scores = (ref_vals - m) - log_z

    got_scores, got_tokens = dk.mlp_head_topk(p, x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_tokens), np.asarray(ref_tokens))
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(ref_scores),
                               atol=1e-5, rtol=1e-5)


def test_mlp_head_topk_tie_breaking():
    """k identical columns spread across vocab blocks: the fused path must return
    them in ascending index order, exactly like lax.top_k on the flat logits."""
    c = 8
    v = 5000
    w3 = np.zeros((c, v), np.float32)
    for col in (3, 2047, 2048, 4096, 4999):  # equal columns straddling blocks
        w3[:, col] = 1.0
    p = {
        "layers": [
            {"w": jnp.eye(c), "b": jnp.zeros(c)},
            {"w": jnp.eye(c), "b": jnp.zeros(c)},
            {"w": jnp.asarray(w3), "b": jnp.zeros(v)},
        ]
    }
    x = jnp.abs(jax.random.normal(jax.random.key(1), (8, c))) + 0.1
    from retr_tpu.models.caption import mlp_head

    logits = mlp_head(p, x).astype(jnp.float32)
    _, ref_tokens = jax.lax.top_k(logits, 5)
    got_scores, got_tokens = dk.mlp_head_topk(p, x, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_tokens), np.asarray(ref_tokens))
    assert (np.asarray(got_tokens) == np.asarray([3, 2047, 2048, 4096, 4999])).all()


def test_mlp_head_argmax_tie_breaking():
    # two identical logit columns: both paths must pick the FIRST index
    c = 8
    p = {
        "layers": [
            {"w": jnp.eye(c), "b": jnp.zeros(c)},
            {"w": jnp.eye(c), "b": jnp.zeros(c)},
            {"w": jnp.concatenate([jnp.ones((c, 2)), jnp.zeros((c, 3000))], axis=1),
             "b": jnp.zeros(3002)},
        ]
    }
    x = jnp.abs(jax.random.normal(jax.random.key(0), (8, c))) + 0.1
    from retr_tpu.models.caption import mlp_head

    ref = jnp.argmax(mlp_head(p, x), axis=-1).astype(jnp.int32)
    got = dk.mlp_head_argmax(p, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert (np.asarray(got) == 0).all()  # column 0 wins the tie with column 1


def test_fused_layer_step_matches_split_kernels():
    """Whole-layer fused kernel == the three-kernel path == the XLA path, in
    interpret mode."""
    cfg_x = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, dim_feedforward=128, vocab_size=96, max_position_embeddings=16,
        dropout=0.0, image_size=32, use_pallas_decode=False,
    )
    cfg_p = cfg_x.replace(use_pallas_decode=True)
    params = transformer.init(jax.random.key(21), cfg_x)

    b, s, t = 16, 9, cfg_x.max_position_embeddings
    memory = jax.random.normal(jax.random.key(22), (b, s, cfg_x.hidden_dim))
    mask = jnp.zeros((b, s), bool).at[:, -1:].set(True)
    pos = jax.random.normal(jax.random.key(23), (s, cfg_x.hidden_dim))
    tgt = jax.random.randint(jax.random.key(24), (b, t), 0, cfg_x.vocab_size)

    def run(cfg, merged):
        old = dk.MERGED_LAYER
        dk.MERGED_LAYER = merged
        try:
            cache, cross = transformer.init_decode_state(params, memory, mask, pos, cfg, t)
            outs = []
            for i in range(5):
                out, cache = transformer.decode_step(params, cache, cross, tgt[:, i], jnp.int32(i), cfg)
                outs.append(out)
            return jnp.stack(outs)
        finally:
            dk.MERGED_LAYER = old

    ref = run(cfg_x, False)
    dk.FORCE_INTERPRET = True
    try:
        split = run(cfg_p, False)
        merged = run(cfg_p, True)
    finally:
        dk.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref), atol=3e-5)


def test_fused_stack_step_matches_xla_path():
    """The single-launch whole-decoder kernel (grid over layers, VERDICT r3
    item 3) produces the same hidden states and caches as the XLA path."""
    cfg_x = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=3, dim_feedforward=128, vocab_size=96, max_position_embeddings=10,
        dropout=0.0, image_size=32, use_pallas_decode=False,
    )
    cfg_p = cfg_x.replace(use_pallas_decode=True)
    params = transformer.init(jax.random.key(7), cfg_x)

    b, s, t = 8, 9, cfg_x.max_position_embeddings
    memory = jax.random.normal(jax.random.key(8), (b, s, cfg_x.hidden_dim))
    mask = jnp.zeros((b, s), bool).at[:, -2:].set(True)
    pos = jax.random.normal(jax.random.key(9), (s, cfg_x.hidden_dim))
    tgt = jax.random.randint(jax.random.key(10), (b, t), 0, cfg_x.vocab_size)

    def run(cfg):
        cache, cross = transformer.init_decode_state(params, memory, mask, pos, cfg, t)
        outs = []
        for i in range(4):
            out, cache = transformer.decode_step(params, cache, cross, tgt[:, i], jnp.int32(i), cfg)
            outs.append(out)
        return jnp.stack(outs), cache

    ref, _ = run(cfg_x)
    dk.FORCE_INTERPRET = True
    dk.LAYER_GRID = True
    try:
        assert transformer._use_layer_grid(cfg_p, b)
        got, cache_p = run(cfg_p)
        assert cache_p.self_k[0].shape == (cfg_p.dec_layers, cfg_p.nheads, b,
                                           cfg_p.head_dim, t)
        # and the per-layer split-kernel path (LAYER_GRID off) agrees too
        dk.LAYER_GRID = False
        got_split, _ = run(cfg_p)
    finally:
        dk.FORCE_INTERPRET = False
        dk.LAYER_GRID = True  # module default — don't leak False to later tests
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_split), np.asarray(ref), atol=3e-5)


def test_bf16_decode_storage_and_parity():
    """True-bf16 decode (round 4): _cast_for_decode moves the decode loop's
    weights/memory/caches to bf16 (the step is bandwidth-bound, docs/ROOFLINE.md),
    while f32 parity mode must pass through untouched. The fused-kernel path and
    the XLA fallback must produce identical tokens in bf16."""
    from retr_tpu import decode
    from retr_tpu.models import layers

    cfg_x = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, dim_feedforward=128, vocab_size=96, max_position_embeddings=12,
        dropout=0.0, image_size=32, use_pallas_decode=False,
    )
    cfg_p = cfg_x.replace(use_pallas_decode=True)
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(0), 5)
    params = {
        "transformer": transformer.init(k1, cfg_x),
        "mlp": {"layers": [
            layers.torch_linear_init(k2, cfg_x.hidden_dim, 32),
            layers.torch_linear_init(k3, 32, 32),
            layers.torch_linear_init(k4, 32, cfg_x.vocab_size),
        ]},
    }
    b, s = 8, 7
    memory = jax.random.normal(k5, (b, s, cfg_x.hidden_dim))
    mask = jnp.zeros((b, s), bool)
    pos = jax.random.normal(jax.random.key(6), (s, cfg_x.hidden_dim))

    # f32 passthrough: identical objects, no copies
    p32, m32, q32 = decode._cast_for_decode(params, memory, pos, jnp.float32)
    assert p32["transformer"] is params["transformer"] and m32 is memory

    p16, m16, q16 = decode._cast_for_decode(params, memory, pos, jnp.bfloat16)
    assert m16.dtype == jnp.bfloat16
    assert p16["mlp"]["layers"][0]["w"].dtype == jnp.bfloat16

    kw = dict(max_len=10, bos_token=2, eos_token=97)  # eos outside vocab: no early stop

    def run(cfg, interpret):
        dk.FORCE_INTERPRET = interpret
        try:
            # caches must inherit the bf16 storage dtype
            cache, _ = transformer.init_decode_state(
                p16["transformer"], m16, mask, q16, cfg, kw["max_len"])
            assert cache.self_k[0].dtype == jnp.bfloat16
            return np.asarray(decode.greedy_from_memory(p16, cfg, m16, mask, q16, **kw))
        finally:
            dk.FORCE_INTERPRET = False

    ids_xla = run(cfg_x, False)
    ids_pal = run(cfg_p, True)
    assert ids_xla.shape == (b, kw["max_len"])
    # the two bf16 implementations round at different points (the kernels keep
    # LN/softmax in f32 and round activations at each dot; XLA keeps bf16
    # throughout), so argmax over near-uniform random-weight logits may flip —
    # require strong agreement, not bit equality (trained-model flip rates are
    # gated on-chip by tools/ab_bf16.py -> docs/AB_BF16.json)
    assert (ids_pal == ids_xla).mean() > 0.7

    # the per-step hidden states themselves must agree to bf16 resolution
    # (FORCE_INTERPRET before init: the cache LAYOUT is chosen at init time by
    # whether the kernels will actually run, transformer._pallas_runtime_active)
    tok = jnp.full((b,), 5, jnp.int32)
    hx = hp = None
    dk.FORCE_INTERPRET = True
    try:
        cache_x, cross_x = transformer.init_decode_state(
            p16["transformer"], m16, mask, q16, cfg_x, kw["max_len"])
        cache_p, cross_p = transformer.init_decode_state(
            p16["transformer"], m16, mask, q16, cfg_p, kw["max_len"])
        for i in range(3):
            hx, cache_x = transformer.decode_step(
                p16["transformer"], cache_x, cross_x, tok, jnp.int32(i), cfg_x)
            hp, cache_p = transformer.decode_step(
                p16["transformer"], cache_p, cross_p, tok, jnp.int32(i), cfg_p)
    finally:
        dk.FORCE_INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(hp, np.float32), np.asarray(hx, np.float32), atol=0.1, rtol=0.05)
