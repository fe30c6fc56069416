"""Fused attention kernels (Pallas TPU) + dispatch.

The reference leans on torch's C++ nn.MultiheadAttention kernel
(transformer_modules.py:22-74); the TPU-native equivalent here is a Pallas kernel
that fuses QK^T, masking (key-padding bias and/or causal), the numerically-stable
softmax, and PV into one VMEM-resident pass per (batch, head, q-block) — no [S, S]
probability matrix ever hits HBM.

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid = (B, H, Sq/block_q); each program holds its q block plus the FULL K/V for
  that (b, h) in VMEM — at this model's sequence lengths (<=512: 397 image+loc
  tokens or the 128-token caption buffer) K/V are a few hundred KB, far under the
  ~16 MB VMEM budget, so the single-pass layout beats an online-softmax flash loop
  (no rescaling traffic). A block-looped variant is the natural extension for S >~
  2k, which this model family never reaches (SURVEY.md §5 long-context note).
- dots request float32 accumulation (preferred_element_type) so bf16 inputs still
  reduce in f32 on the MXU.
- masking is additive: key-padding bias [B, Sk] (0 / -inf) + optional causal term
  computed in-kernel from broadcasted_iota.

The XLA fallback (layers.attention_core) is used on CPU, when attention
probabilities are requested (need_weights), or when attention dropout is active.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30  # finite sentinel: -inf breaks the max-subtract when a row is all-masked


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, causal: bool, block_q: int):
    qi = pl.program_id(2)
    q = q_ref[0, 0, :, :]          # [block_q, D]
    k = k_ref[0, 0, :, :]          # [Sk, D]
    v = v_ref[0, 0, :, :]          # [Sk, D]

    scores = jax.lax.dot_general(
        q.astype(jnp.float32) * scale, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # greedy-parity discipline for f32
    )  # [block_q, Sk]

    scores = scores + bias_ref[pl.program_id(0), :][None, :]
    if causal:
        sk = k.shape[0]
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
        scores = jnp.where(cols <= rows, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / s
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "interpret"))
def fused_attention(
    q: jax.Array,                     # [B, H, Sq, D]
    k: jax.Array,                     # [B, H, Sk, D]
    v: jax.Array,                     # [B, H, Sk, D]
    key_bias: Optional[jax.Array] = None,  # [B, Sk] additive (0 / -inf)
    *,
    causal: bool = False,
    block_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused scaled-dot-product attention; returns [B, H, Sq, D]."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = float(d) ** -0.5

    # pad sequence dims to the tile grid; padded keys get -inf bias, padded q rows
    # are sliced away at the end.
    sq_p = max(block_q, ((sq + block_q - 1) // block_q) * block_q)
    sk_p = max(128, ((sk + 127) // 128) * 128)

    if key_bias is None:
        key_bias = jnp.zeros((b, sk), jnp.float32)
    key_bias = jnp.maximum(key_bias, NEG_INF)  # map -inf -> finite sentinel
    key_bias = _pad_to(key_bias, sk_p, axis=1, value=NEG_INF)

    q = _pad_to(q, sq_p, axis=2)
    k = _pad_to(k, sk_p, axis=2)
    v = _pad_to(v, sk_p, axis=2)

    grid = (b, h, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, causal=causal, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_p, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk_p, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            # full [B, Sk] bias resident per program (a few KB); TPU lowering requires
            # the trailing block dims be tile-aligned or whole-array — so whole-array.
            pl.BlockSpec((b, sk_p), lambda bi, hi, qi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        interpret=interpret,
    )(q, k, v, key_bias)
    return out[:, :, :sq, :]


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    *,
    need_weights: bool = False,
    use_pallas: bool = False,
    causal: bool = False,
    key_bias: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """Dispatch: Pallas fused kernel when eligible, XLA reference otherwise.

    ``bias`` is the general additive [B or 1, 1, Sq or 1, Sk] form used by the XLA
    path; the Pallas path takes the decomposed (key_bias, causal) form instead and
    is only selected when the caller can express its mask that way.
    """
    from retr_tpu.models.layers import attention_core

    interpret = interpret or FORCE_INTERPRET
    eligible = (
        use_pallas
        and not need_weights
        and (interpret or jax.default_backend() != "cpu")
    )
    if eligible:
        return fused_attention(q, k, v, key_bias, causal=causal, interpret=interpret), None
    return attention_core(q, k, v, bias, need_weights=need_weights)


FORCE_INTERPRET = False  # test hook: lets CPU tests exercise the kernel in interpreter mode
