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
HEAD_KERNEL = False      # fused head+argmax: measured ~10% SLOWER than XLA's single
                         # [B,512]x[512,30522] matmul + argmax at B=32 (per-program
                         # trunk recompute + 15-block grid overhead outweigh the
                         # saved HBM logits round trip). Kept flag-gated + tested.


def _batch_block(b: int) -> int:
    """Largest sublane-aligned batch block ≤32 dividing b; keeps per-program K/V
    blocks within the 16MB VMEM budget for big batch*beam products."""
    for bb in (32, 24, 16, 8):
        if b % bb == 0:
            return bb
    raise ValueError(f"batch {b} not divisible by 8 (eligibility should prevent this)")


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dot(a, b):
    # Activations meet the weight dtype at the MXU: in true-bf16 decode the f32
    # LayerNorm/softmax intermediates round to bf16 here (standard mixed
    # precision; accumulation stays f32 via preferred_element_type), and in f32
    # parity mode the astype is a no-op, so parity numerics are untouched.
    # Mixed f32xbf16 operands are also a Mosaic compile error ("Bad rhs type").
    # Precision: HIGHEST = the f32 parity discipline; for bf16 operands a single
    # MXU pass with the f32 accumulator is already the exact product, and Mosaic
    # rejects contract_precision=fp32 on bf16 vectors ("Bad lhs type").
    prec = (jax.lax.Precision.HIGHEST if b.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a.astype(b.dtype), b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


# ---------------------------------------------------------------------------------
# FF residual block
# ---------------------------------------------------------------------------------


def _ff_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    nx = _ln(x, lns_ref[:], lnb_ref[:])
    h = jnp.maximum(_dot(nx, w1_ref[:]) + b1_ref[:], 0.0)
    o_ref[:] = x + (_dot(h, w2_ref[:]) + b2_ref[:]).astype(x.dtype)


def _ff_batch_block(b: int) -> int:
    """Batch block for the FF grid. The weights (C*F*2 ~ 4.2MB f32) are grid-
    invariant (constant index_map -> fetched once); per-program activations are
    x/out [bb, C] + hidden [bb, F]. bb=128 keeps the whole program under ~10MB
    VMEM at f32, so batch is never the thing that caps the kernel (VERDICT r3:
    384 blew the unblocked version's budget while the scaling curve still rose)."""
    for bb in (128, 64, 32, 24, 16, 8):
        if b % bb == 0:
            return bb
    raise ValueError(f"batch {b} not divisible by 8 (eligibility should prevent this)")


@functools.partial(jax.jit, static_argnames=("interpret",))
def ff_block(p: Params, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """x: [B, C] -> [B, C]; p = {'norm': {scale, bias}, 'lin1': {w, b}, 'lin2': {w, b}}.

    Gridded over batch blocks (weights replicated across the grid via constant
    index maps) so arbitrarily large batch*beam products fit VMEM."""
    b, c = x.shape
    bb = _ff_batch_block(b)
    grid = (b // bb,)
    row = lambda i: (i, 0)        # batch-blocked operands
    rep = lambda i: (0, 0)        # grid-invariant (whole-array) operands
    rep1 = lambda i: (0,)
    f = p["lin1"]["w"].shape[1]
    return pl.pallas_call(
        _ff_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, c), x.dtype),
        in_specs=[
            pl.BlockSpec((bb, c), row),
            pl.BlockSpec((c,), rep1), pl.BlockSpec((c,), rep1),
            pl.BlockSpec((c, f), rep), pl.BlockSpec((f,), rep1),
            pl.BlockSpec((f, c), rep), pl.BlockSpec((c,), rep1),
        ],
        out_specs=pl.BlockSpec((bb, c), row),
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


def _cross_kernel(x_ref, qpos_ref, lns_ref, lnb_ref, wq_ref, bq_ref,
                  wo_ref, bo_ref, k_ref, v_ref, bias_ref, o_ref):
    """Grid over heads. Blocks: x [B, C]; wq [1, C, D]; bq [1, 1, D]; wo [1, D, C];
    k/v [1, B, D, S] (S on lanes); bias [B, S]; out [B, C] (accumulated).

    One program = one head's LN -> q-proj -> attention -> out-proj partial; the
    residual + partials accumulate into the VMEM-resident output block across the
    head grid. Per-program VMEM ≈ 2.2MB vs 28MB for a whole-array version
    (D=32 lane padding).
    """
    x = x_ref[:]
    d = wq_ref.shape[2]

    nx = _ln(x, lns_ref[:], lnb_ref[:])
    q = _dot(nx + qpos_ref[:], wq_ref[0]) + bq_ref[0, 0]        # [B, D]
    q = q * (jnp.float32(d) ** -0.5)

    kh = k_ref[0]                                               # [B, D, S]
    vh = v_ref[0]                                               # [B, D, S]
    # scores[b, s] = sum_d q[b, d] * kh[b, d, s]
    scores = jnp.sum(q[:, :, None] * kh, axis=1) + bias_ref[:]  # [B, S]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    attn = jnp.sum(probs[:, None, :] * vh, axis=2)              # [B, D]

    hi = pl.program_id(1)  # grid = (batch blocks, heads); heads iterate innermost
    part = _dot(attn, wo_ref[0])                                # [B, C]

    @pl.when(hi == 0)
    def _():
        o_ref[:] = (x + bo_ref[:] + part).astype(o_ref.dtype)

    @pl.when(hi != 0)
    def _():
        o_ref[:] = o_ref[:] + part.astype(o_ref.dtype)


# ---------------------------------------------------------------------------------
# Self-attention residual block (single query position, cache update in-kernel)
# ---------------------------------------------------------------------------------


def _self_kernel(step_ref, x_ref, qpos_ref, lns_ref, lnb_ref,
                 wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                 wo_ref, bo_ref,
                 kc_in, vc_in, kc_out, vc_out, heads_ref):
    """Grid over heads; scalar-prefetched step. Cache blocks [1, B, D, T] — T on
    LANES (T=128 is an exact lane tile; D=32 on sublanes has zero padding, where a
    trailing D would be padded 32→128 and blow the VMEM budget 4×). The position
    update is an elementwise where() on the lane index; the kernel writes the FULL
    updated block so correctness does not depend on input/output aliasing."""
    x = x_ref[:]
    step = step_ref[0]
    d = wq_ref.shape[2]

    nx = _ln(x, lns_ref[:], lnb_ref[:])
    qk_in = nx + qpos_ref[:]
    q = (_dot(qk_in, wq_ref[0]) + bq_ref[0, 0]) * (jnp.float32(d) ** -0.5)  # [B, D]
    k_new = _dot(qk_in, wk_ref[0]) + bk_ref[0, 0]
    v_new = _dot(nx, wv_ref[0]) + bv_ref[0, 0]

    kc = kc_in[0]  # [B, D, T]
    vc = vc_in[0]
    t = kc.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
    is_step = lane == step
    kc = jnp.where(is_step, k_new[:, :, None], kc)
    vc = jnp.where(is_step, v_new[:, :, None], vc)
    kc_out[0] = kc.astype(kc_out.dtype)
    vc_out[0] = vc.astype(vc_out.dtype)

    scores = jnp.sum(q[:, :, None] * kc, axis=1)             # [B, T]
    valid = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) <= step
    scores = jnp.where(valid, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    attn = jnp.sum(probs[:, None, :] * vc, axis=2)           # [B, D]

    # out-projection folded in: accumulate x + sum_h attn_h @ Wo_h across programs
    # (the output block is VMEM-resident across the whole head grid).
    hi = pl.program_id(1)  # grid = (batch blocks, heads); heads iterate innermost
    part = _dot(attn, wo_ref[0])                             # [B, C]

    @pl.when(hi == 0)
    def _():
        heads_ref[:] = (x + bo_ref[:] + part).astype(heads_ref.dtype)

    @pl.when(hi != 0)
    def _():
        heads_ref[:] = heads_ref[:] + part.astype(heads_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def self_attn_block(
    p: Params,
    x: jax.Array,          # [B, C]
    qpos: jax.Array,       # [C]
    k_cache: jax.Array,    # [H, B, D, T] (pallas-decode layout, T on lanes)
    v_cache: jax.Array,
    step: jax.Array,       # scalar int32
    *,
    num_heads: int,
    interpret: bool = False,
):
    """Returns (x_out [B, C], k_cache', v_cache')."""
    b, c = x.shape
    h = num_heads
    d = c // h
    t = k_cache.shape[3]

    def w3(name):
        return p["mha"][name]["w"].reshape(c, h, d).transpose(1, 0, 2)

    def b3(name):
        return p["mha"][name]["b"].reshape(h, 1, d)

    wo3 = p["mha"]["out"]["w"].reshape(h, d, c)  # row block h*d:(h+1)*d of Wo

    bb = _batch_block(b)
    nb = b // bb

    # grid = (batch blocks, heads) — heads innermost so the output accumulation
    # revisits one VMEM-resident block. Index maps receive (grid indices...,
    # scalar-prefetch refs...).
    bcast = lambda *shape: pl.BlockSpec(shape, lambda bi, hi, s: (0,) * len(shape), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((bb, c), lambda bi, hi, s: (bi, 0), memory_space=pltpu.VMEM)
    per_head3 = pl.BlockSpec((1, c, d), lambda bi, hi, s: (hi, 0, 0), memory_space=pltpu.VMEM)
    per_bias3 = pl.BlockSpec((1, 1, d), lambda bi, hi, s: (hi, 0, 0), memory_space=pltpu.VMEM)
    per_out3 = pl.BlockSpec((1, d, c), lambda bi, hi, s: (hi, 0, 0), memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec((1, bb, d, t), lambda bi, hi, s: (hi, bi, 0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, h),
        in_specs=[
            x_spec, bcast(c), bcast(c), bcast(c),
            per_head3, per_bias3, per_head3, per_bias3, per_head3, per_bias3,
            per_out3, bcast(c),
            cache_spec, cache_spec,
        ],
        out_specs=[cache_spec, cache_spec, x_spec],
    )
    kc, vc, out = pl.pallas_call(
        _self_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((b, c), x.dtype),
        ],
        input_output_aliases={13: 0, 14: 1},  # cache buffers update in place
        interpret=interpret,
    )(
        jnp.asarray(step, jnp.int32).reshape(1),
        x, qpos, p["norm"]["scale"], p["norm"]["bias"],
        w3("q"), b3("q"), w3("k"), b3("k"), w3("v"), b3("v"),
        wo3, p["mha"]["out"]["b"],
        k_cache, v_cache,
    )
    return out, kc, vc


# ---------------------------------------------------------------------------------
# Beam self-attention residual block: ancestry-addressed cache reads
# ---------------------------------------------------------------------------------


def _beam_batch_block(bk: int, k: int) -> int:
    """Largest batch block that covers whole beam groups (multiple of k), divides
    the B*K row count, and stays within the VMEM budget."""
    for g in (8, 4, 2, 1):
        bb = k * g
        if bb <= 64 and bk % bb == 0:
            return bb
    raise ValueError(f"B*K={bk} not divisible by beam groups of {k}")


def _make_self_beam_kernel(num_beams: int):
    def kernel(step_ref, x_ref, anc_ref, qpos_ref, lns_ref, lnb_ref,
               wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wo_ref, bo_ref, kc_in, vc_in, kc_out, vc_out, heads_ref):
        """Like _self_kernel, but each beam row reads position t of its group's
        ancestor row ``anc[row, t]`` instead of its own: a static loop over the
        k candidate rows with an exact one-hot select (each (row, t) matches
        exactly one candidate). Rows still WRITE their own slot — beam reorders
        never touch the caches (the ancestry matrix is the only thing gathered,
        in the caller)."""
        x = x_ref[:]
        step = step_ref[0]
        d = wq_ref.shape[2]

        nx = _ln(x, lns_ref[:], lnb_ref[:])
        qk_in = nx + qpos_ref[:]
        q = (_dot(qk_in, wq_ref[0]) + bq_ref[0, 0]) * (jnp.float32(d) ** -0.5)
        k_new = _dot(qk_in, wk_ref[0]) + bk_ref[0, 0]
        v_new = _dot(nx, wv_ref[0]) + bv_ref[0, 0]

        kc = kc_in[0]  # [BB, D, T]
        vc = vc_in[0]
        bb, _, t = kc.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
        is_step = lane == step
        kc = jnp.where(is_step, k_new[:, :, None], kc)
        vc = jnp.where(is_step, v_new[:, :, None], vc)
        kc_out[0] = kc.astype(kc_out.dtype)
        vc_out[0] = vc.astype(vc_out.dtype)

        kk = num_beams
        g = bb // kk
        anc_g = anc_ref[:].reshape(g, kk, t)     # [G, K, T]
        kc_g = kc.reshape(g, kk, d, t)
        vc_g = vc.reshape(g, kk, d, t)
        q_g = q.reshape(g, kk, d)

        scores = jnp.zeros((g, kk, t), jnp.float32)
        for j in range(kk):
            sj = jnp.sum(q_g[:, :, :, None] * kc_g[:, j][:, None, :, :], axis=2)
            scores = scores + jnp.where(anc_g == j, sj, 0.0)
        valid = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2) <= step
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)

        attn = jnp.zeros((g, kk, d), jnp.float32)
        for j in range(kk):
            pj = jnp.where(anc_g == j, probs, 0.0)
            attn = attn + jnp.sum(pj[:, :, None, :] * vc_g[:, j][:, None, :, :], axis=3)
        attn = attn.reshape(bb, d)

        hi = pl.program_id(1)
        part = _dot(attn, wo_ref[0])

        @pl.when(hi == 0)
        def _():
            heads_ref[:] = (x + bo_ref[:] + part).astype(heads_ref.dtype)

        @pl.when(hi != 0)
        def _():
            heads_ref[:] = heads_ref[:] + part.astype(heads_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "num_beams", "interpret"))
def self_attn_block_beam(
    p: Params,
    x: jax.Array,          # [B*K, C] beam-major rows per batch group
    anc: jax.Array,        # [B*K, T] int32 ancestry (cache row within the group)
    qpos: jax.Array,       # [C]
    k_cache: jax.Array,    # [H, B*K, D, T]
    v_cache: jax.Array,
    step: jax.Array,
    *,
    num_heads: int,
    num_beams: int,
    interpret: bool = False,
):
    """Beam variant of self_attn_block. Returns (x_out, k_cache', v_cache')."""
    bk, c = x.shape
    h = num_heads
    d = c // h
    t = k_cache.shape[3]

    def w3(name):
        return p["mha"][name]["w"].reshape(c, h, d).transpose(1, 0, 2)

    def b3(name):
        return p["mha"][name]["b"].reshape(h, 1, d)

    wo3 = p["mha"]["out"]["w"].reshape(h, d, c)

    bb = _beam_batch_block(bk, num_beams)
    nb = bk // bb

    bcast = lambda *shape: pl.BlockSpec(shape, lambda bi, hi, s: (0,) * len(shape), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((bb, c), lambda bi, hi, s: (bi, 0), memory_space=pltpu.VMEM)
    anc_spec = pl.BlockSpec((bb, t), lambda bi, hi, s: (bi, 0), memory_space=pltpu.VMEM)
    per_head3 = pl.BlockSpec((1, c, d), lambda bi, hi, s: (hi, 0, 0), memory_space=pltpu.VMEM)
    per_bias3 = pl.BlockSpec((1, 1, d), lambda bi, hi, s: (hi, 0, 0), memory_space=pltpu.VMEM)
    per_out3 = pl.BlockSpec((1, d, c), lambda bi, hi, s: (hi, 0, 0), memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec((1, bb, d, t), lambda bi, hi, s: (hi, bi, 0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, h),
        in_specs=[
            x_spec, anc_spec, bcast(c), bcast(c), bcast(c),
            per_head3, per_bias3, per_head3, per_bias3, per_head3, per_bias3,
            per_out3, bcast(c),
            cache_spec, cache_spec,
        ],
        out_specs=[cache_spec, cache_spec, x_spec],
    )
    kc, vc, out = pl.pallas_call(
        _make_self_beam_kernel(num_beams),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((bk, c), x.dtype),
        ],
        input_output_aliases={14: 0, 15: 1},  # cache buffers update in place
        interpret=interpret,
    )(
        jnp.asarray(step, jnp.int32).reshape(1),
        x, anc, qpos, p["norm"]["scale"], p["norm"]["bias"],
        w3("q"), b3("q"), w3("k"), b3("k"), w3("v"), b3("v"),
        wo3, p["mha"]["out"]["b"],
        k_cache, v_cache,
    )
    return out, kc, vc


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
    h = num_heads
    d = c // h
    s = k.shape[2]
    key_bias = jnp.maximum(key_bias, -1e30)  # finite sentinel like ops.attention

    # lane-friendly layouts: K/V as [H, B, D, S]; per-head weight blocks [H, C, D].
    kt = k.transpose(1, 0, 3, 2)
    vt = v.transpose(1, 0, 3, 2)
    wq = p["mha"]["q"]["w"].reshape(c, h, d).transpose(1, 0, 2)   # [H, C, D]
    bq = p["mha"]["q"]["b"].reshape(h, 1, d)
    wo3 = p["mha"]["out"]["w"].reshape(h, d, c)

    bb = _batch_block(b)
    nb = b // bb

    return pl.pallas_call(
        _cross_kernel,
        grid=(nb, h),
        in_specs=[
            pl.BlockSpec((bb, c), lambda bi, hi: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, hi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, hi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, hi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda bi, hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda bi, hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda bi, hi: (hi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, hi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, d, s), lambda bi, hi: (hi, bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, d, s), lambda bi, hi: (hi, bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s), lambda bi, hi: (bi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, c), lambda bi, hi: (bi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c), x.dtype),
        interpret=interpret,
    )(x, qpos, p["norm"]["scale"], p["norm"]["bias"], wq, bq, wo3,
      p["mha"]["out"]["b"], kt, vt, key_bias)


# ---------------------------------------------------------------------------------
# Fused MLP head + argmax (greedy decode tail)
# ---------------------------------------------------------------------------------


def _head_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 mx_ref, idx_ref, *, block_v: int):
    """Grid over vocab blocks. Each program recomputes the tiny trunk
    (256->512->512, ~12 MFLOP — cheaper than synchronizing it), evaluates its
    [B, block_v] logits slab, and emits the slab's (max, first-argmax) per row.
    The [B, 30522] logits never reach HBM."""
    gi = pl.program_id(0)
    x = x_ref[:]
    h1 = jnp.maximum(_dot(x, w1_ref[:]) + b1_ref[:], 0.0)
    h2 = jnp.maximum(_dot(h1, w2_ref[:]) + b2_ref[:], 0.0)
    logits = _dot(h2, w3_ref[:]) + b3_ref[:]               # [B, block_v]

    m = jnp.max(logits, axis=-1, keepdims=True)            # [B, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    first = jnp.min(jnp.where(logits == m, lane, jnp.int32(2**30)), axis=-1, keepdims=True)
    mx_ref[0] = m.astype(jnp.float32).T                    # [1, B]
    idx_ref[0] = (first.T + gi * block_v).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_head_argmax(p: Params, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """x: [B, C] post-final-norm hidden -> greedy argmax token ids [B].

    Bit-matches argmax(mlp_head(x)): identical contraction shapes per output column
    and first-index tie-breaking within and across vocab blocks.
    """
    b, c = x.shape
    w1, b1 = p["layers"][0]["w"], p["layers"][0]["b"]
    w2, b2 = p["layers"][1]["w"], p["layers"][1]["b"]
    w3, b3 = p["layers"][2]["w"], p["layers"][2]["b"]
    v = w3.shape[1]
    block_v = 2048
    v_pad = ((v + block_v - 1) // block_v) * block_v
    g = v_pad // block_v
    if v_pad != v:
        w3 = jnp.pad(w3, ((0, 0), (0, v_pad - v)))
        b3 = jnp.pad(b3, (0, v_pad - v), constant_values=-1e30)  # padded vocab never wins

    h = w2.shape[1]
    mx, idx = pl.pallas_call(
        functools.partial(_head_kernel, block_v=block_v),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((b, c), lambda gi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), lambda gi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda gi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda gi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda gi: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, block_v), lambda gi: (0, gi), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v,), lambda gi: (gi,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, b), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, 1, b), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, b), jnp.int32),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)

    mx = mx[:, 0, :]                                        # [G, B]
    idx = idx[:, 0, :]
    best_block = jnp.argmax(mx, axis=0)                     # first block on ties
    return jnp.take_along_axis(idx, best_block[None, :], axis=0)[0]


# ---------------------------------------------------------------------------------
# Fused head tail for BEAM search: last head matmul + per-row top-k + logsumexp
# in one vocab-blocked program — the [B*K, 30522] logits never reach HBM.
# ---------------------------------------------------------------------------------

BEAM_TOPK_KERNEL = False  # measured NEUTRAL on TPU at [160, 30522]/k=5 (270.9 vs
                          # 268.0 ms/batch, tools/exp_r3.py --beam-ab): the flat
                          # lax.top_k+logsumexp tail is not the beam bottleneck —
                          # the loop is attention/step-overhead-bound. Also 0.07%
                          # of tokens flip vs the flat path (blockwise logsumexp
                          # association perturbs near-tie candidate rankings).
                          # Kept flag-gated + interpreter-tested, like HEAD_KERNEL.


def _head_topk_kernel(h2_ref, w3_ref, b3_ref, vals_ref, idx_ref, m_ref, s_ref,
                      *, block_v: int, k: int):
    """Grid over vocab blocks. Emits per block and per row: the top-k (value,
    global index) pairs, the block max, and sum(exp(logits - block_max)) — the
    sufficient statistics to reconstruct exact top-k + logsumexp outside.
    Unlike the greedy argmax kernel, the 256->512->512 trunk runs ONCE in XLA
    (it is ~2 GFLOP/step at B*K=160 if recomputed across 15 blocks)."""
    gi = pl.program_id(0)
    logits = _dot(h2_ref[:], w3_ref[:]) + b3_ref[:]          # [B, block_v] f32
    m = jnp.max(logits, axis=-1, keepdims=True)              # [B, 1]
    s = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    m_ref[0] = m.astype(jnp.float32).T                       # [1, B]
    s_ref[0] = s.astype(jnp.float32).T
    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    work = logits
    val_rows, idx_rows = [], []
    for _ in range(k):  # k is tiny + static: unrolled max-and-mask selection
        sm = jnp.max(work, axis=-1, keepdims=True)
        first = jnp.min(jnp.where(work == sm, lane, jnp.int32(2**30)),
                        axis=-1, keepdims=True)
        val_rows.append(sm.astype(jnp.float32).T)            # [1, B]
        idx_rows.append((first.T + gi * block_v).astype(jnp.int32))
        work = jnp.where(lane == first, jnp.float32(-3e38), work)
    vals_ref[0] = jnp.concatenate(val_rows, axis=0)          # [k, B]
    idx_ref[0] = jnp.concatenate(idx_rows, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def mlp_head_topk(p: Params, x: jax.Array, k: int, *, interpret: bool = False):
    """x: [B, C] hidden -> (log_softmax top-k values [B, k], token ids [B, k]).

    Value-matches ``lax.top_k(mlp_head(x), k)`` + the winners' exact log_softmax
    (``(v - max) - log(sum(exp(logits - max)))``) with first-index tie-breaking,
    up to logsumexp summation association (blockwise online combine vs one flat
    sum — bounded by f32 rounding; token selection itself uses RAW logit values
    and is exact). The [B, V] logits stay in VMEM slabs.
    """
    w1, b1 = p["layers"][0]["w"], p["layers"][0]["b"]
    w2, b2 = p["layers"][1]["w"], p["layers"][1]["b"]
    w3, b3 = p["layers"][2]["w"], p["layers"][2]["b"]
    # trunk in XLA (tiny), identical ops to caption.mlp_head's first two layers
    h1 = jax.nn.relu(jnp.dot(x, w1) + b1)
    h2 = jax.nn.relu(jnp.dot(h1, w2) + b2)

    b = h2.shape[0]
    c = h2.shape[1]
    v = w3.shape[1]
    block_v = 2048
    v_pad = ((v + block_v - 1) // block_v) * block_v
    g = v_pad // block_v
    if v_pad != v:
        w3 = jnp.pad(w3, ((0, 0), (0, v_pad - v)))
        b3 = jnp.pad(b3, (0, v_pad - v), constant_values=-1e30)  # never wins / exp->0

    vals, idx, m, s = pl.pallas_call(
        functools.partial(_head_topk_kernel, block_v=block_v, k=k),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((b, c), lambda gi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, block_v), lambda gi: (0, gi), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v,), lambda gi: (gi,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, b), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, b), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, k, b), jnp.float32),
            jax.ShapeDtypeStruct((g, k, b), jnp.int32),
            jax.ShapeDtypeStruct((g, 1, b), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, b), jnp.float32),
        ],
        interpret=interpret,
    )(h2, w3, b3)

    # online logsumexp combine across blocks: [G, B] -> [B]
    m2, s2 = m[:, 0, :], s[:, 0, :]
    M = jnp.max(m2, axis=0)                                   # [B]
    Z = jnp.sum(s2 * jnp.exp(m2 - M[None, :]), axis=0)
    log_z = jnp.log(Z)

    # global top-k over the G*k block candidates; flat order = (block, slot) =
    # descending-value-then-first-index within a block, so lax.top_k's positional
    # tie-break reproduces global first-index tie semantics.
    flat_vals = vals.transpose(2, 0, 1).reshape(b, g * k)     # [B, G*k]
    flat_idx = idx.transpose(2, 0, 1).reshape(b, g * k)
    top_vals, pos = jax.lax.top_k(flat_vals, k)               # [B, k]
    tokens = jnp.take_along_axis(flat_idx, pos, axis=1)
    scores = (top_vals - M[:, None]) - log_z[:, None]
    return scores, tokens


# ---------------------------------------------------------------------------------
# Whole-layer fused step: self-attn + cross-attn + FF in ONE program per layer.
# Grid = (batch blocks, 2H+1 phases): phases 0..H-1 self heads, H..2H-1 cross heads,
# 2H the FF tail. Two VMEM scratch accumulators carry the intermediate residuals
# across phases (scratch persists across grid iterations on TPU).
# ---------------------------------------------------------------------------------

MERGED_LAYER = False  # measured on TPU: the 17-phase merged program is ~4-9ms/batch
                      # SLOWER than the three split kernels (phase serialization beats
                      # the saved launches). Kept flag-gated + tested as groundwork.


def _layer_kernel(step_ref, x_ref, qpos_ref,
                  ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
                  swq, sbq, swk, sbk, swv, sbv, swo, sbo,
                  cwq, cbq, cwo, cbo,
                  kc_in, vc_in, ck_ref, cv_ref, bias_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref,
                  kc_out, vc_out, y_ref,
                  a1_ref, a2_ref, *, num_heads: int):
    h = num_heads
    hi = pl.program_id(1)
    step = step_ref[0]
    x = x_ref[:]
    d = swq.shape[2]
    scale = jnp.float32(d) ** -0.5

    @pl.when(hi < h)
    def _self_phase():
        nx = _ln(x, ln1s[:], ln1b[:])
        qk_in = nx + qpos_ref[:]
        q = (_dot(qk_in, swq[0]) + sbq[0, 0]) * scale
        k_new = _dot(qk_in, swk[0]) + sbk[0, 0]
        v_new = _dot(nx, swv[0]) + sbv[0, 0]

        kc = kc_in[0]  # [bb, D, T]
        vc = vc_in[0]
        t = kc.shape[2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
        kc = jnp.where(lane == step, k_new[:, :, None], kc)
        vc = jnp.where(lane == step, v_new[:, :, None], vc)
        kc_out[0] = kc.astype(kc_out.dtype)
        vc_out[0] = vc.astype(vc_out.dtype)

        scores = jnp.sum(q[:, :, None] * kc, axis=1)
        valid = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) <= step
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        attn = jnp.sum(probs[:, None, :] * vc, axis=2)
        part = _dot(attn, swo[0])

        @pl.when(hi == 0)
        def _():
            a1_ref[:] = x.astype(jnp.float32) + sbo[:] + part

        @pl.when(hi != 0)
        def _():
            a1_ref[:] = a1_ref[:] + part

    @pl.when(jnp.logical_and(hi >= h, hi < 2 * h))
    def _cross_phase():
        x1 = a1_ref[:]
        nq = _ln(x1, ln2s[:], ln2b[:])
        q = (_dot(nq + qpos_ref[:], cwq[0]) + cbq[0, 0]) * scale
        kh = ck_ref[0]  # [bb, D, S]
        vh = cv_ref[0]
        scores = jnp.sum(q[:, :, None] * kh, axis=1) + bias_ref[:]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        attn = jnp.sum(probs[:, None, :] * vh, axis=2)
        part = _dot(attn, cwo[0])

        @pl.when(hi == h)
        def _():
            a2_ref[:] = x1 + cbo[:] + part

        @pl.when(hi != h)
        def _():
            a2_ref[:] = a2_ref[:] + part

    @pl.when(hi == 2 * h)
    def _ff_phase():
        x2 = a2_ref[:]
        nx = _ln(x2, ln3s[:], ln3b[:])
        hmid = jnp.maximum(_dot(nx, w1_ref[:]) + b1_ref[:], 0.0)
        y = x2 + _dot(hmid, w2_ref[:]) + b2_ref[:]
        y_ref[:] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_layer_step(
    lp: Params,            # one decoder layer's params (self_attn/cross_attn/ff)
    x: jax.Array,          # [B, C]
    qpos: jax.Array,       # [C]
    k_cache: jax.Array,    # [H, B, D, T]
    v_cache: jax.Array,
    cross_k: jax.Array,    # [B, H, S, D] (XLA layout; transposed here, LICM-hoisted)
    cross_v: jax.Array,
    key_bias: jax.Array,   # [B, S]
    step: jax.Array,
    *,
    num_heads: int,
    interpret: bool = False,
):
    """Returns (x_out [B, C], k_cache', v_cache')."""
    b, c = x.shape
    h = num_heads
    d = c // h
    t = k_cache.shape[3]
    s = cross_k.shape[2]
    cross_k = cross_k.transpose(1, 0, 3, 2)  # -> [H, B, D, S]
    cross_v = cross_v.transpose(1, 0, 3, 2)
    key_bias = jnp.maximum(key_bias, -1e30)

    bb = _batch_block(b)
    nb = b // bb

    sp, cp, fp = lp["self_attn"], lp["cross_attn"], lp["ff"]

    def w3(p, name):
        return p["mha"][name]["w"].reshape(c, h, d).transpose(1, 0, 2)

    def b3(p, name):
        return p["mha"][name]["b"].reshape(h, 1, d)

    swo3 = sp["mha"]["out"]["w"].reshape(h, d, c)
    cwo3 = cp["mha"]["out"]["w"].reshape(h, d, c)

    # phase-clamped index helpers (index maps get (bi, hi, step_ref))
    self_h = lambda bi, hi, st: (jnp.minimum(hi, h - 1), 0, 0)
    cross_h = lambda bi, hi, st: (jnp.clip(hi - h, 0, h - 1), 0, 0)
    self_cache = lambda bi, hi, st: (jnp.minimum(hi, h - 1), bi, 0, 0)
    cross_cache = lambda bi, hi, st: (jnp.clip(hi - h, 0, h - 1), bi, 0, 0)
    at_b = lambda bi, hi, st: (bi, 0)
    fixed = lambda *shape: pl.BlockSpec(shape, lambda bi, hi, st: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, 2 * h + 1),
        in_specs=[
            pl.BlockSpec((bb, c), at_b, memory_space=pltpu.VMEM),   # x
            fixed(c),                                                # qpos
            fixed(c), fixed(c), fixed(c), fixed(c), fixed(c), fixed(c),  # ln1/2/3
            pl.BlockSpec((1, c, d), self_h, memory_space=pltpu.VMEM),   # swq
            pl.BlockSpec((1, 1, d), self_h, memory_space=pltpu.VMEM),   # sbq
            pl.BlockSpec((1, c, d), self_h, memory_space=pltpu.VMEM),   # swk
            pl.BlockSpec((1, 1, d), self_h, memory_space=pltpu.VMEM),   # sbk
            pl.BlockSpec((1, c, d), self_h, memory_space=pltpu.VMEM),   # swv
            pl.BlockSpec((1, 1, d), self_h, memory_space=pltpu.VMEM),   # sbv
            pl.BlockSpec((1, d, c), self_h, memory_space=pltpu.VMEM),   # swo
            fixed(c),                                                    # sbo
            pl.BlockSpec((1, c, d), cross_h, memory_space=pltpu.VMEM),  # cwq
            pl.BlockSpec((1, 1, d), cross_h, memory_space=pltpu.VMEM),  # cbq
            pl.BlockSpec((1, d, c), cross_h, memory_space=pltpu.VMEM),  # cwo
            fixed(c),                                                    # cbo
            pl.BlockSpec((1, bb, d, t), self_cache, memory_space=pltpu.VMEM),   # kc in
            pl.BlockSpec((1, bb, d, t), self_cache, memory_space=pltpu.VMEM),   # vc in
            pl.BlockSpec((1, bb, d, s), cross_cache, memory_space=pltpu.VMEM),  # ck
            pl.BlockSpec((1, bb, d, s), cross_cache, memory_space=pltpu.VMEM),  # cv
            pl.BlockSpec((bb, s), at_b, memory_space=pltpu.VMEM),               # bias
            fixed(c, w3 and fp["lin1"]["w"].shape[1]),                           # w1
            fixed(fp["lin1"]["w"].shape[1]),                                     # b1
            pl.BlockSpec((fp["lin2"]["w"].shape[0], c), lambda bi, hi, st: (0, 0), memory_space=pltpu.VMEM),  # w2
            fixed(c),                                                            # b2
        ],
        out_specs=[
            pl.BlockSpec((1, bb, d, t), self_cache, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, d, t), self_cache, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, c), at_b, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, c), jnp.float32),
            pltpu.VMEM((bb, c), jnp.float32),
        ],
    )
    kc, vc, y = pl.pallas_call(
        functools.partial(_layer_kernel, num_heads=h),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((b, c), x.dtype),
        ],
        input_output_aliases={21: 0, 22: 1},
        interpret=interpret,
    )(
        jnp.asarray(step, jnp.int32).reshape(1),
        x, qpos,
        sp["norm"]["scale"], sp["norm"]["bias"],
        cp["norm"]["scale"], cp["norm"]["bias"],
        fp["norm"]["scale"], fp["norm"]["bias"],
        w3(sp, "q"), b3(sp, "q"), w3(sp, "k"), b3(sp, "k"), w3(sp, "v"), b3(sp, "v"),
        swo3, sp["mha"]["out"]["b"],
        w3(cp, "q"), b3(cp, "q"), cwo3, cp["mha"]["out"]["b"],
        k_cache, v_cache, cross_k, cross_v, key_bias,
        fp["lin1"]["w"], fp["lin1"]["b"], fp["lin2"]["w"], fp["lin2"]["b"],
    )
    return y, kc, vc


# ---------------------------------------------------------------------------------
# ALL decoder layers in ONE launch: grid (L, 2H+1) over stacked layer params
# (VERDICT r3 item 3). The per-layer merged kernel (MERGED_LAYER above) lost to
# the split kernels; the remaining untried shape collapses the 18 launches/step
# (6 layers x {self, cross, ff}) into ONE pallas_call while KEEPING the phase
# split that won: the grid's second dim encodes phase exactly like _layer_kernel,
# and the first dim walks the layers, with the running hidden state carried in a
# VMEM scratch buffer (scratch persists across grid iterations, so no
# output-revisit semantics are needed for the x carry). Restricted to batches
# that fit a single batch block (b <= 32): with one batch block, layer-major and
# batch-major grid orders coincide and stacked weights are fetched exactly once
# per step, same HBM traffic as the split kernels.
# ---------------------------------------------------------------------------------

# Measured WIN on TPU v5e (round 4, tools/exp_r4.py --layer-grid-ab, interleaved):
# 0.506 vs 0.535 ms/step greedy batch-32 (+5.9% captions/s), tokens identical.
# Applies to single-batch-block decodes (b <= 32): batch-32 eval, serving, prefix.
LAYER_GRID = True

# Batch ceiling for ALL fused decode kernels (round 5, tools/exp_r5.py
# --layer-grid-batch-ab, chained-step device protocol, true-bf16 storage).
# Past one batch block the kernels' full-cache write-back pays ~2x the XLA
# path's in-place one-lane dynamic-update-slice, and XLA wins by growing
# margins: 0.39 vs 0.92 ms/step at b=128, 1.54 vs 3.56 ms at b=512. A
# staging-row kernel variant (rows out, caller merges) measured WORSE
# (2.84 ms at b=128: XLA copies the cache around the custom call). Above this
# ceiling decode dispatch (models/transformer._pallas_decode_eligible) rides
# the pure-XLA step — which is also the parity reference path. Per-batch
# numbers: docs/ROOFLINE.md (SoL table) and docs/PERF.md r5.
MAX_KERNEL_BATCH = 32


def stack_layer_params(layer_params) -> Params:
    """Stack a list of per-layer param dicts leaf-wise on a new leading axis.

    Called inside the decode loop body on loop-invariant params — XLA hoists the
    stack out of the while-loop, so it costs one concat per decode CALL, not per
    step."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def _stack_kernel(step_ref, x_ref, qpos_ref,
                  ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
                  swq, sbq, swk, sbk, swv, sbv, swo, sbo,
                  cwq, cbq, cwo, cbo,
                  kc_in, vc_in, ck_ref, cv_ref, bias_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref,
                  kc_out, vc_out, y_ref,
                  a1_ref, a2_ref, xs_ref, *, num_heads: int, num_ff_chunks: int):
    h = num_heads
    nf = num_ff_chunks
    li = pl.program_id(0)
    hi = pl.program_id(1)
    step = step_ref[0]
    d = swq.shape[3]
    scale = jnp.float32(d) ** -0.5

    @pl.when(hi < h)
    def _self_phase():
        # layer input: the real input block at layer 0, the carried scratch after
        # (reading uninitialized scratch at li==0 is fine — where() discards it)
        x = jnp.where(li == 0, x_ref[:].astype(jnp.float32), xs_ref[:])
        nx = _ln(x, ln1s[0, 0], ln1b[0, 0])
        qk_in = nx + qpos_ref[:]
        q = (_dot(qk_in, swq[0, 0]) + sbq[0, 0, 0]) * scale
        k_new = _dot(qk_in, swk[0, 0]) + sbk[0, 0, 0]
        v_new = _dot(nx, swv[0, 0]) + sbv[0, 0, 0]

        kc = kc_in[0, 0]  # [B, D, T]
        vc = vc_in[0, 0]
        t = kc.shape[2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
        kc = jnp.where(lane == step, k_new[:, :, None], kc)
        vc = jnp.where(lane == step, v_new[:, :, None], vc)
        kc_out[0, 0] = kc.astype(kc_out.dtype)
        vc_out[0, 0] = vc.astype(vc_out.dtype)

        scores = jnp.sum(q[:, :, None] * kc, axis=1)
        valid = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) <= step
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        attn = jnp.sum(probs[:, None, :] * vc, axis=2)
        part = _dot(attn, swo[0, 0])

        @pl.when(hi == 0)
        def _():
            a1_ref[:] = x + sbo[0, 0] + part

        @pl.when(hi != 0)
        def _():
            a1_ref[:] = a1_ref[:] + part

    @pl.when(jnp.logical_and(hi >= h, hi < 2 * h))
    def _cross_phase():
        x1 = a1_ref[:]
        nq = _ln(x1, ln2s[0, 0], ln2b[0, 0])
        q = (_dot(nq + qpos_ref[:], cwq[0, 0]) + cbq[0, 0, 0]) * scale
        kh = ck_ref[0, 0]  # [B, D, S]
        vh = cv_ref[0, 0]
        scores = jnp.sum(q[:, :, None] * kh, axis=1) + bias_ref[:]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        attn = jnp.sum(probs[:, None, :] * vh, axis=2)
        part = _dot(attn, cwo[0, 0])

        @pl.when(hi == h)
        def _():
            a2_ref[:] = x1 + cbo[0, 0] + part

        @pl.when(hi != h)
        def _():
            a2_ref[:] = a2_ref[:] + part

    # FF is split over ``nf`` hidden-dim chunks (one grid phase each) so the
    # w1/w2 blocks stay within the 16 MB scoped-VMEM budget: chunk j computes
    # relu(nx @ w1[:, j]) @ w2[j, :] and accumulates into the layer carry.
    @pl.when(hi >= 2 * h)
    def _ff_phase():
        j = hi - 2 * h
        x2 = a2_ref[:]
        nx = _ln(x2, ln3s[0, 0], ln3b[0, 0])
        hmid = jnp.maximum(_dot(nx, w1_ref[0]) + b1_ref[0, 0, 0], 0.0)
        part = _dot(hmid, w2_ref[0])

        @pl.when(j == 0)
        def _():
            xs_ref[:] = x2 + b2_ref[0, 0] + part

        @pl.when(j != 0)
        def _():
            xs_ref[:] = xs_ref[:] + part

        @pl.when(j == nf - 1)
        def _():
            # resident single block; last write (= last layer's) wins
            y_ref[:] = xs_ref[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_stack_step(
    slp: Params,           # ALL decoder layers' params, leaf-stacked on axis 0
    x: jax.Array,          # [B, C], B <= 32 (single batch block)
    qpos: jax.Array,       # [C]
    k_cache: jax.Array,    # [L, H, B, D, T] stacked self caches
    v_cache: jax.Array,
    cross_k: jax.Array,    # [L, B, H, S, D] stacked cross K (XLA layout)
    cross_v: jax.Array,
    key_bias: jax.Array,   # [B, S]
    step: jax.Array,
    *,
    num_heads: int,
    interpret: bool = False,
):
    """Returns (x_out [B, C] after ALL layers, k_cache', v_cache')."""
    L, _, b, d, t = k_cache.shape
    _, c = x.shape
    h = num_heads
    s = cross_k.shape[3]
    if b > 32:
        raise ValueError("fused_stack_step requires a single batch block (b <= 32)")
    cross_k = cross_k.transpose(0, 2, 1, 4, 3)  # -> [L, H, B, D, S]
    cross_v = cross_v.transpose(0, 2, 1, 4, 3)
    key_bias = jnp.maximum(key_bias, -1e30)

    sp, cp, fp = slp["self_attn"], slp["cross_attn"], slp["ff"]
    f = fp["lin1"]["w"].shape[2]
    # FF hidden-dim chunking: keep each w1/w2 block <= c*1024 floats so the
    # double-buffered FF weights fit the 16 MB scoped-VMEM budget alongside the
    # self/cross cache blocks (measured: whole-f blocks at f=2048 overflow by ~2 MB).
    nf = max(1, f // 1024)
    while f % nf:
        nf -= 1
    fc = f // nf

    def w4(p, name):  # [L, C, H*D] -> [L, H, C, D]
        return p["mha"][name]["w"].reshape(L, c, h, d).transpose(0, 2, 1, 3)

    def b4(p, name):  # [L, H*D] -> [L, H, 1, D]
        return p["mha"][name]["b"].reshape(L, h, 1, d)

    swo4 = sp["mha"]["out"]["w"].reshape(L, h, d, c)
    cwo4 = cp["mha"]["out"]["w"].reshape(L, h, d, c)

    # per-layer vectors reshaped [L, 1, C] so the last-two block dims stay
    # whole-dim (Mosaic tiling rule)
    def vec(a):
        return a.reshape(L, 1, -1)

    self_h = lambda li, hi, st: (li, jnp.minimum(hi, h - 1), 0, 0)
    cross_h = lambda li, hi, st: (li, jnp.clip(hi - h, 0, h - 1), 0, 0)
    self_cache = lambda li, hi, st: (li, jnp.minimum(hi, h - 1), 0, 0, 0)
    cross_cache = lambda li, hi, st: (li, jnp.clip(hi - h, 0, h - 1), 0, 0, 0)
    at_l2 = lambda li, hi, st: (li, 0, 0)
    whole2 = lambda li, hi, st: (0, 0)
    lvec = pl.BlockSpec((1, 1, c), at_l2, memory_space=pltpu.VMEM)
    fixed1 = pl.BlockSpec((c,), lambda li, hi, st: (0,), memory_space=pltpu.VMEM)
    wblk = lambda: pl.BlockSpec((1, 1, c, d), self_h, memory_space=pltpu.VMEM)
    bblk = lambda: pl.BlockSpec((1, 1, 1, d), self_h, memory_space=pltpu.VMEM)
    cwblk = lambda: pl.BlockSpec((1, 1, c, d), cross_h, memory_space=pltpu.VMEM)
    cbblk = lambda: pl.BlockSpec((1, 1, 1, d), cross_h, memory_space=pltpu.VMEM)

    ffj = lambda li, hi, st: (li, 0, jnp.clip(hi - 2 * h, 0, nf - 1))
    ffj2 = lambda li, hi, st: (li, jnp.clip(hi - 2 * h, 0, nf - 1), 0)
    ffj3 = lambda li, hi, st: (li, jnp.clip(hi - 2 * h, 0, nf - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, 2 * h + nf),
        in_specs=[
            pl.BlockSpec((b, c), whole2, memory_space=pltpu.VMEM),   # x
            fixed1,                                                   # qpos
            lvec, lvec, lvec, lvec, lvec, lvec,                       # ln1/2/3 s,b
            wblk(), bblk(), wblk(), bblk(), wblk(), bblk(),           # s q/k/v
            pl.BlockSpec((1, 1, d, c), self_h, memory_space=pltpu.VMEM),   # swo
            lvec,                                                           # sbo
            cwblk(), cbblk(),                                               # c q
            pl.BlockSpec((1, 1, d, c), cross_h, memory_space=pltpu.VMEM),  # cwo
            lvec,                                                           # cbo
            pl.BlockSpec((1, 1, b, d, t), self_cache, memory_space=pltpu.VMEM),   # kc
            pl.BlockSpec((1, 1, b, d, t), self_cache, memory_space=pltpu.VMEM),   # vc
            pl.BlockSpec((1, 1, b, d, s), cross_cache, memory_space=pltpu.VMEM),  # ck
            pl.BlockSpec((1, 1, b, d, s), cross_cache, memory_space=pltpu.VMEM),  # cv
            pl.BlockSpec((b, s), whole2, memory_space=pltpu.VMEM),                # bias
            pl.BlockSpec((1, c, fc), ffj, memory_space=pltpu.VMEM),               # w1
            pl.BlockSpec((1, 1, 1, fc), ffj3, memory_space=pltpu.VMEM),           # b1
            pl.BlockSpec((1, fc, c), ffj2, memory_space=pltpu.VMEM),              # w2
            lvec,                                                                  # b2
        ],
        out_specs=[
            pl.BlockSpec((1, 1, b, d, t), self_cache, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b, d, t), self_cache, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), whole2, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.float32),   # a1: self-attn residual accumulator
            pltpu.VMEM((b, c), jnp.float32),   # a2: cross-attn residual accumulator
            pltpu.VMEM((b, c), jnp.float32),   # xs: hidden state carried across layers
        ],
    )
    kc, vc, y = pl.pallas_call(
        functools.partial(_stack_kernel, num_heads=h, num_ff_chunks=nf),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((b, c), x.dtype),
        ],
        input_output_aliases={21: 0, 22: 1},
        interpret=interpret,
    )(
        jnp.asarray(step, jnp.int32).reshape(1),
        x, qpos,
        vec(sp["norm"]["scale"]), vec(sp["norm"]["bias"]),
        vec(cp["norm"]["scale"]), vec(cp["norm"]["bias"]),
        vec(fp["norm"]["scale"]), vec(fp["norm"]["bias"]),
        w4(sp, "q"), b4(sp, "q"), w4(sp, "k"), b4(sp, "k"), w4(sp, "v"), b4(sp, "v"),
        swo4, vec(sp["mha"]["out"]["b"]),
        w4(cp, "q"), b4(cp, "q"), cwo4, vec(cp["mha"]["out"]["b"]),
        k_cache, v_cache, cross_k, cross_v, key_bias,
        fp["lin1"]["w"], fp["lin1"]["b"].reshape(L, nf, 1, fc), fp["lin2"]["w"], vec(fp["lin2"]["b"]),
    )
    return y, kc, vc
