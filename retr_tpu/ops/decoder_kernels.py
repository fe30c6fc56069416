"""Pallas kernels for the autoregressive decode step.

The KV-cached decode step is fusion-count-bound on TPU (docs/PERF.md): ~15 small XLA
fusions per decoder layer at ~10µs fixed cost each dominate the 0.86ms/step budget,
not FLOPs or bandwidth. These kernels collapse whole residual blocks into single
Mosaic programs with every operand VMEM-resident:

- :func:`ff_block` — LayerNorm -> Linear(C,F) -> ReLU -> Linear(F,C) -> +residual
  (the FFResidual block, transformer_modules.py:77-97) in ONE kernel; weights
  (256x2048 x2 ≈ 4.2MB f32) fit VMEM comfortably.
- :func:`cross_attn_block` — LayerNorm -> +query-pos -> Q proj -> attention over the
  precomputed memory K/V -> out proj -> +residual for a single query position.

Both use f32 HIGHEST-precision dots (greedy-parity discipline). Gated by
``Config.use_pallas_decode``; the XLA path remains the default/parity reference and
the CPU/interpret fallback.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict

FORCE_INTERPRET = False  # test hook: run kernels in interpreter mode on CPU


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------------
# FF residual block
# ---------------------------------------------------------------------------------


def _ff_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    nx = _ln(x, lns_ref[:], lnb_ref[:])
    h = jnp.maximum(_dot(nx, w1_ref[:]) + b1_ref[:], 0.0)
    o_ref[:] = x + (_dot(h, w2_ref[:]) + b2_ref[:]).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ff_block(p: Params, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """x: [B, C] -> [B, C]; p = {'norm': {scale, bias}, 'lin1': {w, b}, 'lin2': {w, b}}."""
    b, c = x.shape
    return pl.pallas_call(
        _ff_kernel,
        out_shape=jax.ShapeDtypeStruct((b, c), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x,
        p["norm"]["scale"], p["norm"]["bias"],
        p["lin1"]["w"], p["lin1"]["b"],
        p["lin2"]["w"], p["lin2"]["b"],
    )


# ---------------------------------------------------------------------------------
# Cross-attention residual block (single query position)
# ---------------------------------------------------------------------------------


def _cross_kernel(x_ref, qpos_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                  k_ref, v_ref, bias_ref, o_ref, *, num_heads: int):
    """x [B, C]; k/v [B, H, S, D]; bias [B, S] additive; out [B, C]."""
    x = x_ref[:]
    b, c = x.shape
    h = num_heads
    d = c // h

    nx = _ln(x, lns_ref[:], lnb_ref[:])
    q = _dot(nx + qpos_ref[:], wq_ref[:]) + bq_ref[:]          # [B, C]
    scale = jnp.float32(d) ** -0.5

    acc = jnp.zeros((b, c), jnp.float32)
    for hi in range(h):
        qh = q[:, hi * d : (hi + 1) * d] * scale               # [B, D]
        kh = k_ref[:, hi, :, :]                                 # [B, S, D]
        vh = v_ref[:, hi, :, :]
        # scores[b, s] = sum_d qh[b, d] * kh[b, s, d]  (q length 1 -> VPU reduce)
        scores = jnp.sum(qh[:, None, :] * kh, axis=-1) + bias_ref[:]   # [B, S]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        outh = jnp.sum(probs[:, :, None] * vh, axis=1)          # [B, D]
        acc = acc.at[:, hi * d : (hi + 1) * d].set(outh)

    o_ref[:] = x + (_dot(acc, wo_ref[:]) + bo_ref[:]).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def cross_attn_block(
    p: Params,
    x: jax.Array,          # [B, C]
    qpos: jax.Array,       # [C]
    k: jax.Array,          # [B, H, S, D]
    v: jax.Array,          # [B, H, S, D]
    key_bias: jax.Array,   # [B, S] additive 0/-inf
    *,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    b, c = x.shape
    key_bias = jnp.maximum(key_bias, -1e30)  # finite sentinel like ops.attention
    return pl.pallas_call(
        functools.partial(_cross_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, c), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x, qpos,
        p["norm"]["scale"], p["norm"]["bias"],
        p["mha"]["q"]["w"], p["mha"]["q"]["b"],
        p["mha"]["out"]["w"], p["mha"]["out"]["b"],
        k, v, key_bias,
    )
