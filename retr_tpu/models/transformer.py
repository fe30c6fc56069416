"""ConcatTransformer: pre-norm encoder-decoder with context-stream concat fusion.

Faithful re-design of the reference transformer (models/ConcatTransformer.py,
models/transformer_modules.py) as pure functions in batch-first [B, S, C] layout:

- optional context stream is concatenated to the target stream along the sequence axis
  *before* positional encoding (ConcatTransformer.py:48-55);
- 1-D sine positional encoding over the flattened sequence — NOT DETR's 2-D spatial
  sine (ConcatTransformer.py:55, position_encoding.py:7-35);
- residual blocks are ALWAYS pre-norm (transformer_modules.py:22-97);
  ``pre_norm`` only gates the encoder's final LayerNorm (ConcatTransformer.py:24-26);
  the decoder always has a final LayerNorm (ConcatTransformer.py:32-33);
- self-attention adds positional encoding to Q and K only, value = normed input;
  cross-attention norms ONLY the query — key gets pos but key/value are the *unnormed*
  memory (transformer_modules.py:31-35, 57-63);
- decoder query_pos is the learned position-embedding table itself
  (ConcatTransformer.py:64-65);
- residual LayerNorms use torch's default eps=1e-5; the DecoderEmbeddings LayerNorm
  uses config.layer_norm_eps=1e-12 (transformer_modules.py:100-128).

Besides the full teacher-forced forward, this module exposes the encode-once /
step-decode split used by the KV-cached autoregressive loop in retr_tpu.decode —
the reference re-runs backbone+encoder+full decoder every step
(eval_utils/decode.py:53-81); here the encoder runs once, cross-attention K/V are
precomputed per layer, and each step touches one position.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from retr_tpu.config import Config
from retr_tpu.masking import NEG_INF, causal_mask, key_padding_bias
from retr_tpu.models import layers
from retr_tpu.models.positional import learned_init, positional_encoding
from retr_tpu.precision import matmul_precision

Params = Dict[str, Any]


# ---------------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------------


def _enc_layer_init(key, d, dff):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self_attn": {"norm": layers.layer_norm_init(d), "mha": layers.mha_init(k1, d)},
        "ff": {
            "norm": layers.layer_norm_init(d),
            "lin1": layers.xavier_linear_init(k2, d, dff),
            "lin2": layers.xavier_linear_init(k3, dff, d),
        },
    }


def _dec_layer_init(key, d, dff):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "self_attn": {"norm": layers.layer_norm_init(d), "mha": layers.mha_init(k1, d)},
        "cross_attn": {"norm": layers.layer_norm_init(d), "mha": layers.mha_init(k2, d)},
        "ff": {
            "norm": layers.layer_norm_init(d),
            "lin1": layers.xavier_linear_init(k3, d, dff),
            "lin2": layers.xavier_linear_init(k4, dff, d),
        },
    }


def init(key, cfg: Config) -> Params:
    d, dff = cfg.hidden_dim, cfg.dim_feedforward
    keys = jax.random.split(key, cfg.enc_layers + cfg.dec_layers + 3)
    enc_keys, dec_keys = keys[: cfg.enc_layers], keys[cfg.enc_layers : cfg.enc_layers + cfg.dec_layers]
    kw, kp, kl = keys[-3:]

    params: Params = {
        "encoder": {
            "layers": [_enc_layer_init(k, d, dff) for k in enc_keys],
        },
        "decoder": {
            "layers": [_dec_layer_init(k, d, dff) for k in dec_keys],
            "norm": layers.layer_norm_init(d),
        },
        "embeddings": {
            "word": layers.embedding_init(kw, cfg.vocab_size, d),
            "pos": layers.embedding_init(kp, cfg.max_position_embeddings, d),
            "norm": layers.layer_norm_init(d),
        },
    }
    if cfg.pre_norm:
        params["encoder"]["norm"] = layers.layer_norm_init(d)
    if cfg.position_embedding in ("v3", "learned"):
        params["src_pos"] = learned_init(kl, d, max_len=1024)
    return params


# ---------------------------------------------------------------------------------
# Sub-blocks
# ---------------------------------------------------------------------------------


def _with_pos(x, pos):
    return x if pos is None else x + pos


def _self_att_block(p, x, pos, bias, cfg, *, need_weights, key, train,
                    causal=False, key_pad_bias=None):
    """SelfAttResidual (transformer_modules.py:22-46)."""
    nx = layers.layer_norm(p["norm"], x)
    qk = _with_pos(nx, pos)
    k_attn, k_res = (None, None) if key is None else jax.random.split(key)
    out, w = layers.multi_head_attention(
        p["mha"], qk, qk, nx,
        num_heads=cfg.nheads, bias=bias, need_weights=need_weights,
        dropout_rate=cfg.dropout, dropout_key=k_attn, train=train,
        use_pallas=cfg.use_pallas_attention, causal=causal, key_pad_bias=key_pad_bias,
    )
    return x + layers.dropout(out, cfg.dropout, k_res, train), w


def _cross_att_block(p, q, kv, q_pos, k_pos, bias, cfg, *, need_weights, key, train,
                     key_pad_bias=None):
    """CrossAttResidual (transformer_modules.py:49-74): only the query is normed."""
    nq = layers.layer_norm(p["norm"], q)
    k_attn, k_res = (None, None) if key is None else jax.random.split(key)
    out, w = layers.multi_head_attention(
        p["mha"], _with_pos(nq, q_pos), _with_pos(kv, k_pos), kv,
        num_heads=cfg.nheads, bias=bias, need_weights=need_weights,
        dropout_rate=cfg.dropout, dropout_key=k_attn, train=train,
        use_pallas=cfg.use_pallas_attention, key_pad_bias=key_pad_bias,
    )
    return q + layers.dropout(out, cfg.dropout, k_res, train), w


def _ff_block(p, x, cfg, *, key, train):
    """FFResidual (transformer_modules.py:77-97): Linear-ReLU-Linear, pre-norm."""
    nx = layers.layer_norm(p["norm"], x)
    h = layers.linear(p["lin2"], jax.nn.relu(layers.linear(p["lin1"], nx)))
    return x + layers.dropout(h, cfg.dropout, key, train)


def decoder_embed(p, ids, cfg, *, key=None, train=False, position_offset=None):
    """DecoderEmbeddings (transformer_modules.py:100-128): word + learned pos, LN(eps
    = config.layer_norm_eps), dropout. ``position_offset`` selects positions for
    incremental decoding ([B] or scalar start index)."""
    word = layers.embedding(p["word"], ids)
    if position_offset is None:
        pos_ids = jnp.arange(ids.shape[-1])
        pos = layers.embedding(p["pos"], pos_ids)
    else:
        pos = layers.embedding(p["pos"], position_offset)
    emb = layers.layer_norm(p["norm"], word + pos, eps=cfg.layer_norm_eps)
    return layers.dropout(emb, cfg.dropout, key, train)


# ---------------------------------------------------------------------------------
# Encoder / decoder stacks (full-sequence)
# ---------------------------------------------------------------------------------


def encode(
    params: Params,
    src: jax.Array,          # [B, S, C]
    src_pad_mask: jax.Array,  # [B, S] bool True=pad
    cfg: Config,
    *,
    need_weights: bool = False,
    key: Optional[jax.Array] = None,
    train: bool = False,
):
    """Run the encoder; returns (memory [B,S,C], pos [S,C], enc_atts or None)."""
    s = src.shape[1]
    pos = positional_encoding(
        cfg.position_embedding, s, cfg.hidden_dim, params.get("src_pos"),
        dropout_rate=cfg.dropout, key=None if key is None else jax.random.fold_in(key, 999),
        train=train,
    )
    bias = key_padding_bias(src_pad_mask)
    kp_bias = bias[:, 0, 0, :]  # [B, S] additive form for the Pallas kernel

    # Remat (Config.remat): recompute each encoder layer in the backward pass
    # instead of keeping its attention/FF activations resident. Only meaningful
    # under differentiation; the attention-map path keeps the plain trace.
    use_remat = cfg.remat and not need_weights

    def enc_layer(lp, x, k_sa, k_ff):
        x, _ = _self_att_block(
            lp["self_attn"], x, pos[None, :, :], bias, cfg,
            need_weights=False, key=k_sa, train=train, key_pad_bias=kp_bias,
        )
        return _ff_block(lp["ff"], x, cfg, key=k_ff, train=train)

    if use_remat:
        enc_layer = jax.checkpoint(enc_layer)

    x = src
    enc_ws = []
    for li, lp in enumerate(params["encoder"]["layers"]):
        lk = None if key is None else jax.random.fold_in(key, li)
        k_sa, k_ff = (None, None) if lk is None else jax.random.split(lk)
        if use_remat:
            x = enc_layer(lp, x, k_sa, k_ff)
            continue
        x, w = _self_att_block(
            lp["self_attn"], x, pos[None, :, :], bias, cfg,
            need_weights=need_weights, key=k_sa, train=train, key_pad_bias=kp_bias,
        )
        if need_weights:
            enc_ws.append(w)
        x = _ff_block(lp["ff"], x, cfg, key=k_ff, train=train)
    if "norm" in params["encoder"]:
        x = layers.layer_norm(params["encoder"]["norm"], x)
    atts = {"enc_tc_self_att": jnp.stack(enc_ws)} if need_weights else None
    return x, pos, atts


def decode_full(
    params: Params,
    memory: jax.Array,        # [B, S, C]
    mem_pad_mask: jax.Array,  # [B, S]
    pos: jax.Array,           # [S, C] source positional encoding
    tgt_ids: jax.Array,       # [B, T] token ids
    tgt_pad_mask: jax.Array,  # [B, T] bool True=pad
    cfg: Config,
    *,
    need_weights: bool = False,
    key: Optional[jax.Array] = None,
    train: bool = False,
):
    """Teacher-forced decoder over the full target buffer; returns [B, T, C]."""
    t = tgt_ids.shape[1]
    k_emb = None if key is None else jax.random.fold_in(key, 777)
    x = decoder_embed(params["embeddings"], tgt_ids, cfg, key=k_emb, train=train)
    query_pos = params["embeddings"]["pos"]["table"][:t][None, :, :]  # [1, T, C]

    self_bias = causal_mask(t)[None, None, :, :] + key_padding_bias(tgt_pad_mask)
    mem_bias = key_padding_bias(mem_pad_mask)
    tgt_kp = key_padding_bias(tgt_pad_mask)[:, 0, 0, :]
    mem_kp = mem_bias[:, 0, 0, :]

    # Remat (Config.remat): see encode() — per-layer jax.checkpoint on the
    # differentiated path only.
    use_remat = cfg.remat and not need_weights

    def dec_layer(lp, x, memory, k_sa, k_ca, k_ff):
        x, _ = _self_att_block(
            lp["self_attn"], x, query_pos, self_bias, cfg,
            need_weights=False, key=k_sa, train=train,
            causal=True, key_pad_bias=tgt_kp,
        )
        x, _ = _cross_att_block(
            lp["cross_attn"], x, memory, query_pos, pos[None, :, :], mem_bias, cfg,
            need_weights=False, key=k_ca, train=train, key_pad_bias=mem_kp,
        )
        return _ff_block(lp["ff"], x, cfg, key=k_ff, train=train)

    if use_remat:
        dec_layer = jax.checkpoint(dec_layer)

    dec_sws, dec_cws = [], []
    for li, lp in enumerate(params["decoder"]["layers"]):
        lk = None if key is None else jax.random.fold_in(key, 100 + li)
        k_sa, k_ca, k_ff = (None, None, None) if lk is None else jax.random.split(lk, 3)
        if use_remat:
            x = dec_layer(lp, x, memory, k_sa, k_ca, k_ff)
            continue
        x, sw = _self_att_block(
            lp["self_attn"], x, query_pos, self_bias, cfg,
            need_weights=need_weights, key=k_sa, train=train,
            causal=True, key_pad_bias=tgt_kp,
        )
        x, cw = _cross_att_block(
            lp["cross_attn"], x, memory, query_pos, pos[None, :, :], mem_bias, cfg,
            need_weights=need_weights, key=k_ca, train=train, key_pad_bias=mem_kp,
        )
        x = _ff_block(lp["ff"], x, cfg, key=k_ff, train=train)
        if need_weights:
            dec_sws.append(sw)
            dec_cws.append(cw)
    x = layers.layer_norm(params["decoder"]["norm"], x)
    atts = (
        {"dec_exp_self_att": jnp.stack(dec_sws), "dec_exp_tc_cross_att": jnp.stack(dec_cws)}
        if need_weights
        else None
    )
    return x, atts


def forward(
    params: Params,
    src_t: jax.Array,         # [B, C, S_t] target-stream features (channel-first like the reference)
    mask_t: jax.Array,        # [B, S_t]
    src_c: Optional[jax.Array],
    mask_c: Optional[jax.Array],
    tgt_ids: jax.Array,
    tgt_pad_mask: jax.Array,
    cfg: Config,
    *,
    return_attention: bool = False,
    key: Optional[jax.Array] = None,
    train: bool = False,
):
    """Reference ConcatTransformer.forward (ConcatTransformer.py:45-74)."""
    if src_c is not None:
        src = jnp.concatenate([src_t, src_c], axis=2)
        mask = jnp.concatenate([mask_t, mask_c], axis=1)
    else:
        src, mask = src_t, mask_t

    src = jnp.swapaxes(src, 1, 2)  # [B, S, C]
    with matmul_precision(src.dtype):
        k_enc = None if key is None else jax.random.fold_in(key, 0)
        k_dec = None if key is None else jax.random.fold_in(key, 1)
        memory, pos, enc_atts = encode(
            params, src, mask, cfg, need_weights=return_attention, key=k_enc, train=train
        )
        out, dec_atts = decode_full(
            params, memory, mask, pos, tgt_ids, tgt_pad_mask, cfg,
            need_weights=return_attention, key=k_dec, train=train,
        )
    if return_attention:
        return out, {**(enc_atts or {}), **(dec_atts or {})}
    return out, None


# ---------------------------------------------------------------------------------
# Incremental (KV-cached) decoding — encode once, one position per step.
# ---------------------------------------------------------------------------------


def _pallas_decode_eligible(cfg: Config, batch: int) -> bool:
    """Fused decode kernels need a sublane-aligned batch (the kernels block the
    batch in multiples of 8; Mosaic also rejects B=1 reductions) AND a batch
    within their measured winning range (dk.MAX_KERNEL_BATCH — past one batch
    block their full-cache write-back loses ~2x to XLA's in-place one-lane
    update, docs/PERF.md r5). Everything else rides the XLA path (which is the
    parity reference anyway); batches just below eligibility are padded up to
    it by the decode drivers (decode._kernel_row_padding)."""
    from retr_tpu.ops import decoder_kernels as dk

    return (cfg.use_pallas_decode and batch >= 8 and batch % 8 == 0
            and batch <= dk.MAX_KERNEL_BATCH)


def _pallas_runtime_active() -> bool:
    """Whether the fused kernels will actually RUN here: compiled Mosaic needs a
    TPU backend; dk.FORCE_INTERPRET is the CPU test hook. Cache layout (head-major
    for the kernels) and kernel dispatch must make this decision IDENTICALLY —
    deciding layout from eligibility alone left use_pallas_decode=True configs on
    CPU with a head-major cache feeding the XLA path (shape error)."""
    from retr_tpu.ops import decoder_kernels as dk

    return dk.FORCE_INTERPRET or jax.default_backend() != "cpu"


def _use_decode_kernels(cfg: Config, batch: int) -> bool:
    return _pallas_decode_eligible(cfg, batch) and _pallas_runtime_active()


def _use_layer_grid(cfg: Config, batch: int) -> bool:
    """Single-launch whole-decoder kernel (dk.fused_stack_step): flag-gated,
    single-batch-block only (the grid is (L, 2H+1); with one batch block the
    stacked weights are fetched exactly once per step)."""
    from retr_tpu.ops import decoder_kernels as dk

    return dk.LAYER_GRID and _use_decode_kernels(cfg, batch) and batch <= 32


class DecodeCache(NamedTuple):
    """The MUTABLE half of decode state — per-layer self-attention KV caches as
    tuples of [B, H, T_max, D] arrays. This is the while-loop carry; everything
    loop-invariant lives in :class:`CrossContext` and is closed over by the loop
    body instead (carrying ~77MB of invariant cross-K/V through the carry invites
    per-iteration copies)."""

    self_k: Tuple[jax.Array, ...]
    self_v: Tuple[jax.Array, ...]


class CrossContext(NamedTuple):
    """The IMMUTABLE half: per-layer cross-attention K/V (precomputed once from the
    encoder memory) and the memory key-padding bias."""

    cross_k: Tuple[jax.Array, ...]
    cross_v: Tuple[jax.Array, ...]
    mem_bias: jax.Array  # [B, 1, 1, S]


def init_decode_state(
    params: Params,
    memory: jax.Array,
    mem_pad_mask: jax.Array,
    pos: jax.Array,
    cfg: Config,
    max_len: int,
    *,
    force_xla_layout: bool = False,
    allow_layer_grid: bool = True,
) -> Tuple[DecodeCache, CrossContext]:
    """Precompute cross-attention K/V per decoder layer (memory is fixed), allocate
    empty self-attention caches with static shapes.

    ``force_xla_layout`` keeps the [B, H, T, D] self-cache layout even when the
    Pallas decode kernels are eligible — beam search's ancestry-addressed
    self-attention (decode_step_beam) runs on the XLA path while cross/FF still
    use the Pallas blocks."""
    b = memory.shape[0]
    h, dh = cfg.nheads, cfg.head_dim
    kp = _with_pos(memory, pos[None, :, :])

    cross_k, cross_v = [], []
    for lp in params["decoder"]["layers"]:
        mha = lp["cross_attn"]["mha"]
        cross_k.append(layers.split_heads(layers.linear(mha["k"], kp), h))
        cross_v.append(layers.split_heads(layers.linear(mha["v"], memory), h))

    dtype = memory.dtype
    if _use_layer_grid(cfg, b) and allow_layer_grid and not force_xla_layout:
        # single-launch whole-decoder kernel: ONE stacked cache [L, H, B, D, T]
        # per k/v (held as a 1-tuple so DecodeCache's pytree structure is stable)
        shape = (cfg.dec_layers, h, b, dh, max_len)
        cache = DecodeCache(
            self_k=(jnp.zeros(shape, dtype),), self_v=(jnp.zeros(shape, dtype),)
        )
    else:
        if _use_decode_kernels(cfg, b) and not force_xla_layout:
            # fused-kernel layout: head-major [H, B, D, T] (T on lanes) so each
            # grid-over-heads program owns a padding-free (1, B, D, T) cache block.
            shape = (h, b, dh, max_len)
        else:
            shape = (b, h, max_len, dh)
        cache = DecodeCache(
            self_k=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.dec_layers)),
            self_v=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.dec_layers)),
        )
    cross = CrossContext(tuple(cross_k), tuple(cross_v), key_padding_bias(mem_pad_mask))
    return cache, cross


def decode_step(
    params: Params,
    state: DecodeCache,
    cross: CrossContext,
    token_ids: jax.Array,  # [B] token at position `step`
    step: jax.Array,       # scalar int32 — current position
    cfg: Config,
) -> Tuple[jax.Array, DecodeCache]:
    """One autoregressive step: embed position `step`, run all decoder layers against
    the KV caches, return the hidden state [B, C] for that position.

    Numerically equivalent to the reference's full-buffer recompute at position
    `step` (dropout off): padded positions beyond `step` are excluded here by the
    causal/key-padding bias exactly as tgt_key_padding_mask excludes them there.
    """
    stacked = state.self_k[0].ndim == 5  # layer-grid cache [L, H, B, D, T]
    max_len = state.self_k[0].shape[
        4 if stacked else 3 if _use_decode_kernels(cfg, token_ids.shape[0]) else 2
    ]
    x = decoder_embed(params["embeddings"], token_ids[:, None], cfg, position_offset=step[None])
    # x: [B, 1, C]
    qpos = params["embeddings"]["pos"]["table"][step][None, None, :]  # [1, 1, C]

    if stacked:
        from retr_tpu.ops import decoder_kernels as dk

        # ALL layers in ONE launch: params stacked leaf-wise (loop-invariant, so
        # XLA hoists the stacks out of the decode while-loop), hidden state
        # carried across layers in VMEM scratch inside the kernel.
        slp = dk.stack_layer_params(params["decoder"]["layers"])
        ck = jnp.stack(cross.cross_k)   # [L, B, H, S, D] — loop-invariant too
        cv = jnp.stack(cross.cross_v)
        y, kc, vc = dk.fused_stack_step(
            slp, x[:, 0, :], params["embeddings"]["pos"]["table"][step],
            state.self_k[0], state.self_v[0], ck, cv,
            cross.mem_bias[:, 0, 0, :], step,
            num_heads=cfg.nheads, interpret=dk.FORCE_INTERPRET,
        )
        out = layers.layer_norm(params["decoder"]["norm"], y[:, None, :])
        return out[:, 0, :], DecodeCache(self_k=(kc,), self_v=(vc,))

    # keys at positions > step are masked (their cache rows are zeros anyway).
    valid = jnp.arange(max_len)[None, None, None, :] <= step
    self_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)  # [1,1,1,T]

    h = cfg.nheads
    use_pk = _use_decode_kernels(cfg, token_ids.shape[0])
    if use_pk:
        from retr_tpu.ops import decoder_kernels as dk

        pk_interpret = dk.FORCE_INTERPRET
        qpos_row = params["embeddings"]["pos"]["table"][step]       # [C]
        mem_kb = cross.mem_bias[:, 0, 0, :]                          # [B, S]

    self_k, self_v = list(state.self_k), list(state.self_v)
    for li, lp in enumerate(params["decoder"]["layers"]):
        if use_pk and dk.MERGED_LAYER:
            # whole layer (self + cross + FF) in one Pallas program
            x2d, self_k[li], self_v[li] = dk.fused_layer_step(
                lp, x[:, 0, :], qpos_row, self_k[li], self_v[li],
                cross.cross_k[li], cross.cross_v[li], mem_kb, step,
                num_heads=h, interpret=pk_interpret,
            )
            x = x2d[:, None, :]
            continue
        # -- self-attention over the cache
        sp = lp["self_attn"]
        if use_pk:
            x2d, self_k[li], self_v[li] = dk.self_attn_block(
                sp, x[:, 0, :], qpos_row, self_k[li], self_v[li], step,
                num_heads=h, interpret=pk_interpret,
            )
            x = x2d[:, None, :]
        else:
            nx = layers.layer_norm(sp["norm"], x)
            qk_in = _with_pos(nx, qpos)
            # q and k share their input: one fused [E, 2E] matmul (the weight concat
            # is loop-invariant — XLA hoists it out of the decode while-loop).
            wqk = jnp.concatenate([sp["mha"]["q"]["w"], sp["mha"]["k"]["w"]], axis=1)
            bqk = jnp.concatenate([sp["mha"]["q"]["b"], sp["mha"]["k"]["b"]])
            qk = qk_in @ wqk + bqk
            e = cfg.hidden_dim
            q = layers.split_heads(qk[..., :e], h)       # [B,H,1,D]
            k_new = layers.split_heads(qk[..., e:], h)
            v_new = layers.split_heads(layers.linear(sp["mha"]["v"], nx), h)
            self_k[li] = self_k[li].at[:, :, step, :].set(k_new[:, :, 0, :])
            self_v[li] = self_v[li].at[:, :, step, :].set(v_new[:, :, 0, :])
            out, _ = layers.attention_core(q, self_k[li], self_v[li], self_bias)
            x = x + layers.linear(sp["mha"]["out"], layers.merge_heads(out))

        # -- cross-attention against precomputed memory K/V
        cp = lp["cross_attn"]
        if use_pk:
            x = dk.cross_attn_block(
                cp, x[:, 0, :], qpos_row, cross.cross_k[li], cross.cross_v[li],
                mem_kb, num_heads=h, interpret=pk_interpret,
            )[:, None, :]
        else:
            nq = layers.layer_norm(cp["norm"], x)
            qc = layers.split_heads(layers.linear(cp["mha"]["q"], _with_pos(nq, qpos)), h)
            outc, _ = layers.attention_core(qc, cross.cross_k[li], cross.cross_v[li], cross.mem_bias)
            x = x + layers.linear(cp["mha"]["out"], layers.merge_heads(outc))

        # -- feed-forward
        if use_pk:
            x = dk.ff_block(lp["ff"], x[:, 0, :], interpret=pk_interpret)[:, None, :]
        else:
            x = _ff_block(lp["ff"], x, cfg, key=None, train=False)

    x = layers.layer_norm(params["decoder"]["norm"], x)
    return x[:, 0, :], state._replace(self_k=tuple(self_k), self_v=tuple(self_v))


def decode_step_beam(
    params: Params,
    state: DecodeCache,
    cross: CrossContext,
    token_ids: jax.Array,  # [B*K] token at position `step`, beam-major per batch
    step: jax.Array,       # scalar int32
    cfg: Config,
    anc: jax.Array,        # [B, K, T] int32 ancestry: physical beam row that wrote t
    num_beams: int,
) -> Tuple[jax.Array, DecodeCache]:
    """Beam-search decode step with ANCESTRY-ADDRESSED self-attention.

    Beam reorders never physically gather the self caches (the round-1 cost:
    ~258 ms/batch of pure cache shuffling at k=5, measured in tools/exp_r2.py).
    Instead each beam row always writes its own cache slot, and attention reads
    position t from the ancestor row ``anc[b, k, t]``:

      scores[b,i,h,t] = sum_j (q[b,i] . K[b,j,t]) * [anc[b,i,t] == j]

    The K dot runs against ALL k beams of the batch group as one batched matmul
    (k x FLOPs — trivial at D=32) and the one-hot select is EXACT (one nonzero
    per t), so selected scores are bit-identical to a physically gathered cache.
    Cross-attention K/V are beam-invariant and FF is per-row, so both reuse the
    greedy machinery (Pallas blocks when eligible).
    """
    bk = token_ids.shape[0]
    k = num_beams
    b = bk // k
    h, dh = cfg.nheads, cfg.head_dim
    use_pk = _use_decode_kernels(cfg, bk)
    if use_pk:
        from retr_tpu.ops import decoder_kernels as dk

        pk_interpret = dk.FORCE_INTERPRET
    max_len = state.self_k[0].shape[3 if use_pk else 2]

    x = decoder_embed(params["embeddings"], token_ids[:, None], cfg, position_offset=step[None])
    qpos = params["embeddings"]["pos"]["table"][step][None, None, :]

    valid = jnp.arange(max_len)[None, None, None, :] <= step
    self_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)  # [1,1,1,T]

    if use_pk:
        qpos_row = params["embeddings"]["pos"]["table"][step]
        mem_kb = cross.mem_bias[:, 0, 0, :]
        anc_rows = anc.reshape(bk, max_len)
    else:
        # one-hot ancestry selector [B, I(=k query beams), J(=k cache rows), T]
        sel = (anc[:, :, None, :] == jnp.arange(k, dtype=anc.dtype)[None, None, :, None])

    self_k, self_v = list(state.self_k), list(state.self_v)
    for li, lp in enumerate(params["decoder"]["layers"]):
        # -- self-attention: write own row, read through ancestry
        sp = lp["self_attn"]
        if use_pk:
            x2d, self_k[li], self_v[li] = dk.self_attn_block_beam(
                sp, x[:, 0, :], anc_rows, qpos_row, self_k[li], self_v[li], step,
                num_heads=h, num_beams=k, interpret=pk_interpret,
            )
            x = x2d[:, None, :]
        else:
            nx = layers.layer_norm(sp["norm"], x)
            qk_in = _with_pos(nx, qpos)
            wqk = jnp.concatenate([sp["mha"]["q"]["w"], sp["mha"]["k"]["w"]], axis=1)
            bqk = jnp.concatenate([sp["mha"]["q"]["b"], sp["mha"]["k"]["b"]])
            qk = qk_in @ wqk + bqk
            e = cfg.hidden_dim
            q = layers.split_heads(qk[..., :e], h)[:, :, 0, :]          # [BK, H, D]
            k_new = layers.split_heads(qk[..., e:], h)
            v_new = layers.split_heads(layers.linear(sp["mha"]["v"], nx), h)
            self_k[li] = self_k[li].at[:, :, step, :].set(k_new[:, :, 0, :])
            self_v[li] = self_v[li].at[:, :, step, :].set(v_new[:, :, 0, :])

            kc = self_k[li].reshape(b, k, h, max_len, dh)
            vc = self_v[li].reshape(b, k, h, max_len, dh)
            qr = q.reshape(b, k, h, dh)
            scale = jnp.asarray(dh, jnp.float32) ** -0.5
            # all-beams scores, then the exact one-hot select (same scaling order
            # as layers.attention_core: q scaled before the dot)
            s_all = jnp.einsum(
                "bihd,bjhtd->bihjt", qr * scale.astype(qr.dtype), kc,
                preferred_element_type=jnp.float32,
            )
            scores = jnp.sum(s_all * sel[:, :, None, :, :], axis=3)     # [B, I, H, T]
            scores = scores + self_bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            pmask = probs[:, :, :, None, :] * sel[:, :, None, :, :].astype(probs.dtype)
            out = jnp.einsum("bihjt,bjhtd->bihd", pmask.astype(vc.dtype), vc)
            out = out.reshape(bk, 1, h * dh)
            x = x + layers.linear(sp["mha"]["out"], out)

        # -- cross-attention (beam-invariant K/V) + FF: same as greedy
        cp = lp["cross_attn"]
        if use_pk:
            x = dk.cross_attn_block(
                cp, x[:, 0, :], qpos_row, cross.cross_k[li], cross.cross_v[li],
                mem_kb, num_heads=h, interpret=pk_interpret,
            )[:, None, :]
            x = dk.ff_block(lp["ff"], x[:, 0, :], interpret=pk_interpret)[:, None, :]
        else:
            nq = layers.layer_norm(cp["norm"], x)
            qc = layers.split_heads(layers.linear(cp["mha"]["q"], _with_pos(nq, qpos)), h)
            outc, _ = layers.attention_core(qc, cross.cross_k[li], cross.cross_v[li], cross.mem_bias)
            x = x + layers.linear(cp["mha"]["out"], layers.merge_heads(outc))
            x = _ff_block(lp["ff"], x, cfg, key=None, train=False)

    x = layers.layer_norm(params["decoder"]["norm"], x)
    return x[:, 0, :], state._replace(self_k=tuple(self_k), self_v=tuple(self_v))
