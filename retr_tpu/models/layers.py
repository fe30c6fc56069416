"""Primitive layers as pure init/apply functions over param pytrees.

Numerics deliberately match torch so that (a) weights imported from reference
checkpoints reproduce reference activations and (b) greedy decode token-matches the
PyTorch reference (BASELINE.md north star). Param layout is JAX-friendly:
linear weights are stored ``[in, out]`` (transpose of torch's ``[out, in]``) so the hot
path is a plain ``x @ w`` on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Params = dict

# ---------------------------------------------------------------------------------
# Initializers (matching torch defaults so from-scratch training matches in
# distribution; forward parity is exact for imported weights regardless).
# ---------------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """nn.init.xavier_uniform_ on a [in, out] weight (fan_in=shape[0], fan_out=shape[1])."""
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return _uniform(key, shape, bound, dtype)


def torch_linear_init(key, in_dim, out_dim, dtype=jnp.float32) -> Params:
    """torch nn.Linear default: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in) for both w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": _uniform(kw, (in_dim, out_dim), bound, dtype),
        "b": _uniform(kb, (out_dim,), bound, dtype),
    }


def xavier_linear_init(key, in_dim, out_dim, dtype=jnp.float32) -> Params:
    """Linear whose weight was re-initialized by ConcatTransformer._reset_parameters
    (xavier uniform, ConcatTransformer.py:40-43) while the bias kept its torch default."""
    kw, kb = jax.random.split(key)
    bound_b = 1.0 / math.sqrt(in_dim)
    return {
        "w": xavier_uniform(kw, (in_dim, out_dim), dtype),
        "b": _uniform(kb, (out_dim,), bound_b, dtype),
    }


def linear(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def layer_norm_init(dim, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch nn.LayerNorm over the last dim (biased variance)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def embedding_init(key, num, dim, dtype=jnp.float32) -> Params:
    """Xavier-uniform embedding table — ConcatTransformer._reset_parameters re-inits
    every dim>1 param including the embedding tables (ConcatTransformer.py:40-43)."""
    return {"table": xavier_uniform(key, (num, dim), dtype)}


def embedding(p: Params, ids: jax.Array) -> jax.Array:
    """Out-of-range ids produce NaN rows (JAX gather fill semantics) — a loud signal
    for a tokenizer/vocab_size mismatch, where torch would raise at dispatch."""
    return jnp.take(p["table"], ids, axis=0)


def dropout(x: jax.Array, rate: float, key: Optional[jax.Array], train: bool) -> jax.Array:
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------------
# Multi-head attention — numerics of torch nn.MultiheadAttention
# (q scaled by head_dim**-0.5 before QK^T; softmax in f32; optional head-averaged
#  probability output matching need_weights=True).
# ---------------------------------------------------------------------------------


def mha_init(key, embed_dim, dtype=jnp.float32) -> Params:
    """torch MHA init: in_proj xavier_uniform on the stacked [3E, E] weight (fan_in=E,
    fan_out=3E ⇒ bound √(6/4E)); in_proj bias zeros; out_proj weight xavier'd again by
    ConcatTransformer._reset_parameters; out_proj bias zeros."""
    kq, kk, kv, ko = jax.random.split(key, 4)
    e = embed_dim
    bound = math.sqrt(6.0 / (e + 3 * e))
    return {
        "q": {"w": _uniform(kq, (e, e), bound, dtype), "b": jnp.zeros((e,), dtype)},
        "k": {"w": _uniform(kk, (e, e), bound, dtype), "b": jnp.zeros((e,), dtype)},
        "v": {"w": _uniform(kv, (e, e), bound, dtype), "b": jnp.zeros((e,), dtype)},
        "out": {"w": xavier_uniform(ko, (e, e), dtype), "b": jnp.zeros((e,), dtype)},
    }


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, S, E] -> [B, H, S, D]"""
    b, s, e = x.shape
    return x.reshape(b, s, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, S, D] -> [B, S, E]"""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    *,
    need_weights: bool = False,
):
    """Scaled dot-product attention on [B, H, S, D] tensors with additive bias.

    Rows whose bias is entirely -inf produce NaN (softmax of all -inf), matching torch —
    callers guard against that case exactly where the reference does.
    """
    d = q.shape[-1]
    scale = jnp.asarray(d, jnp.float32) ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale.astype(q.dtype), k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    if need_weights:
        return out, jnp.mean(probs, axis=1)  # head-averaged, torch need_weights=True
    return out, None


def multi_head_attention(
    p: Params,
    query: jax.Array,
    key_: jax.Array,
    value: jax.Array,
    *,
    num_heads: int,
    bias: Optional[jax.Array] = None,
    need_weights: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
    use_pallas: bool = False,
    causal: bool = False,
    key_pad_bias: Optional[jax.Array] = None,
):
    """Full MHA: project, attend, merge, out-project. Inputs [B, S, E].

    When ``use_pallas`` and the mask decomposes as (key_pad_bias [B, Sk], causal),
    the fused Pallas kernel handles the attention core (ops/attention.py); the XLA
    einsum path covers everything else (CPU, attention maps, dropout).
    """
    q = split_heads(linear(p["q"], query), num_heads)
    k = split_heads(linear(p["k"], key_), num_heads)
    v = split_heads(linear(p["v"], value), num_heads)

    if use_pallas and not need_weights and not (dropout_rate > 0.0 and train):
        from retr_tpu.ops.attention import attention as fused

        out, _ = fused(
            q, k, v, bias, need_weights=False, use_pallas=True,
            causal=causal, key_bias=key_pad_bias,
        )
        return linear(p["out"], merge_heads(out.astype(v.dtype))), None

    if dropout_rate > 0.0 and train:
        # torch applies dropout to the attention probabilities; replicate on that path.
        d = q.shape[-1]
        scale = jnp.asarray(d, jnp.float32) ** -0.5
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale.astype(q.dtype), k, preferred_element_type=jnp.float32
        )
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        probs_d = dropout(probs, dropout_rate, dropout_key, train)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs_d.astype(v.dtype), v)
        weights = jnp.mean(probs, axis=1) if need_weights else None
    else:
        out, weights = attention_core(q, k, v, bias, need_weights=need_weights)

    out = linear(p["out"], merge_heads(out))
    return out, weights
