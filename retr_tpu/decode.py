"""Autoregressive decoding: jit-compiled, KV-cached, static shapes.

Replaces eval_utils/decode.py. The reference's batched greedy re-runs the ENTIRE model
(backbone + encoder + full 128-position decoder) once per emitted token
(decode.py:53-81 — its #1 performance defect). Here:

- the backbone + encoder run ONCE (`caption.encode`);
- cross-attention K/V are precomputed per layer;
- a `lax.while_loop` emits one token per step against self-attention KV caches,
  stopping early when every sample has produced EOS — the same early exit as the
  reference (decode.py:75-76);
- token semantics match the reference exactly: BOS in slot 0, logits read at position
  i, argmax written to slot i+1, EOS-finished samples keep receiving (ignored) tokens,
  and the final write is skipped when everyone is finished, so the buffer — including
  post-EOS junk — is bit-identical to the reference's (decode.py:53-81);
- `prune_token_ids` reproduces decode.py:84-101 (cut at EOS, strip specials).

Beam search (k, length-normalized) is a north-star extension — the reference has no
beam search (BASELINE.md config 3).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from retr_tpu.config import Config, program_config
from retr_tpu.masking import Masked
from retr_tpu.models import caption, transformer
from retr_tpu.precision import matmul_precision

Params = Dict[str, Any]


def _normalize_static_cfg(fn):
    """Route the static ``cfg`` through config.program_config before it reaches
    jit: host-only fields (paths, batch sizes, LR knobs, ...) can't enter these
    traces, but they WOULD fragment jit's executable cache — and this jax build
    never dedupes identical HLO, so each fragment is a real 10 s+ recompile."""

    def wrapper(params, cfg=None, *args, **kwargs):
        if cfg is None:
            cfg = kwargs.pop("cfg")
        return fn(params, program_config(cfg), *args, **kwargs)

    wrapper.__name__ = getattr(fn, "__name__", "decode_fn")
    wrapper.__doc__ = fn.__doc__
    wrapper.__wrapped__ = fn
    return wrapper


# ---------------------------------------------------------------------------------
# Greedy
# ---------------------------------------------------------------------------------


class _GreedyCarry(NamedTuple):
    captions: jax.Array   # [B, L] int32 token buffer
    finished: jax.Array   # [B] bool
    cache: transformer.DecodeCache
    step: jax.Array       # scalar int32


def _kernel_row_padding(cfg: Config, b: int) -> int:
    """Rows to append so the fused Pallas decode kernels are eligible for ANY
    batch: they need b % 8 == 0 and b >= 8 (transformer._pallas_decode_eligible).
    The padded rows carry zeroed memory with an all-valid key mask (an all-masked
    row would softmax over -inf -> NaN), start 'finished' so the reference's
    all-finished write/stop semantics over the REAL rows are unchanged, and are
    sliced off before returning. Without this, batch 12 decoded on the XLA path
    purely because of a divisibility rule (VERDICT r3 item 2). Padding only
    happens when the padded batch stays within the kernels' measured winning
    range (dk.MAX_KERNEL_BATCH): past it the XLA path is the FASTER one
    (docs/PERF.md r5), so larger batches ride it unpadded by design."""
    if not cfg.use_pallas_decode:
        return 0
    from retr_tpu.ops import decoder_kernels as dk

    pad = (-b) % 8
    return pad if b + pad <= dk.MAX_KERNEL_BATCH else 0


def _pad_rows(memory: jax.Array, mem_mask: jax.Array, pad: int):
    if pad == 0:
        return memory, mem_mask
    memory = jnp.pad(memory, ((0, pad), (0, 0), (0, 0)))
    mem_mask = jnp.pad(mem_mask, ((0, pad), (0, 0)))  # False = valid key
    return memory, mem_mask


def _initial_finished(b_real: int, pad: int) -> jax.Array:
    return jnp.arange(b_real + pad) >= b_real


def _cast_for_decode(params: Params, memory, pos, compute_dtype):
    """Storage dtype for the decode loop: in throughput (bf16) mode the decoder
    weights, head, encoder memory — and therefore the cross K/V and self KV
    caches allocated from them — all live in ``compute_dtype``.

    The decode step is HBM-bandwidth-bound (docs/ROOFLINE.md): its bytes are the
    per-step streams of cross K/V, self caches, and head weights. Before round 4
    "bf16 mode" only lowered matmul *precision*; the loop's storage stayed f32
    (params were never cast, so every linear promoted), which doubled every one
    of those streams. Casting once here — outside the while_loop, on its
    loop-invariant operands — halves per-step traffic. f32 parity mode returns
    everything untouched. LayerNorm/softmax/logit-max still compute in f32
    inside the kernels and layers (see ops/decoder_kernels._ln, layers.layer_norm).
    """
    if jnp.dtype(compute_dtype) == jnp.float32:
        return params, memory, pos
    cast = lambda tree: jax.tree.map(
        lambda a: a.astype(compute_dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)
    params = {**params, "transformer": cast(params["transformer"]),
              "mlp": cast(params["mlp"])}
    return params, memory.astype(compute_dtype), pos.astype(compute_dtype)


def greedy_from_memory(
    params: Params,
    cfg: Config,
    memory: jax.Array,
    mem_mask: jax.Array,
    pos: jax.Array,
    *,
    max_len: int,
    bos_token: int,
    eos_token: int,
) -> jax.Array:
    """Greedy decode given encoder output; returns the [B, max_len] token buffer with
    the reference's exact write/stop semantics."""
    b_real = memory.shape[0]
    pad = _kernel_row_padding(cfg, b_real)
    memory, mem_mask = _pad_rows(memory, mem_mask, pad)
    b = memory.shape[0]
    cache, cross = transformer.init_decode_state(
        params["transformer"], memory, mem_mask, pos, cfg, max_len
    )
    captions = jnp.zeros((b, max_len), jnp.int32).at[:, 0].set(bos_token)

    use_pk_head = False
    if transformer._pallas_decode_eligible(cfg, b):
        from retr_tpu.ops import decoder_kernels as dk

        use_pk_head = dk.HEAD_KERNEL and (dk.FORCE_INTERPRET or jax.default_backend() != "cpu")

    def cond(c: _GreedyCarry):
        return jnp.logical_and(c.step < max_len - 1, ~jnp.all(c.finished))

    def body(c: _GreedyCarry):
        # `cross` (the ~10s-of-MB invariant K/V) is a closure constant, NOT carry.
        hs, cache = transformer.decode_step(
            params["transformer"], c.cache, cross, c.captions[:, c.step], c.step, cfg
        )
        if use_pk_head:
            from retr_tpu.ops import decoder_kernels as dk

            # fused head+argmax: the [B, V] logits never touch HBM
            pred = dk.mlp_head_argmax(params["mlp"], hs, interpret=dk.FORCE_INTERPRET)
        else:
            logits = caption.mlp_head(params["mlp"], hs)        # [B, V]
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        finished = jnp.logical_or(pred == eos_token, c.finished)
        # reference decode.py:75-79 — when all just finished, the write is skipped.
        write = ~jnp.all(finished)
        captions = jnp.where(
            write, c.captions.at[:, c.step + 1].set(pred), c.captions
        )
        return _GreedyCarry(captions, finished, cache, c.step + 1)

    init = _GreedyCarry(captions, _initial_finished(b_real, pad), cache, jnp.int32(0))
    with matmul_precision(memory.dtype):
        out = jax.lax.while_loop(cond, body, init)
    return out.captions[:b_real]


@_normalize_static_cfg
@partial(jax.jit, static_argnames=("cfg", "max_len", "bos_token", "eos_token", "compute_dtype"))
def greedy(
    params: Params,
    cfg: Config,
    samples: Masked,
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    max_len: int = 128,
    bos_token: int = 101,
    eos_token: int = 102,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Batched greedy decoding (reference decode.py:53-81): encode once, then the
    KV-cached loop. Fully jit-compiled with static shapes."""
    memory, mem_mask, pos = caption.encode(
        params, cfg, samples, global_samples=global_samples, loc_feats=loc_feats,
        compute_dtype=compute_dtype,
    )
    params, memory, pos = _cast_for_decode(params, memory, pos, compute_dtype)
    return greedy_from_memory(
        params, cfg, memory, mem_mask, pos,
        max_len=max_len, bos_token=bos_token, eos_token=eos_token,
    )


# ---------------------------------------------------------------------------------
# Prefix-forced completion (extension; not in the reference)
# ---------------------------------------------------------------------------------


@_normalize_static_cfg
@partial(jax.jit, static_argnames=("cfg", "max_len", "bos_token", "eos_token", "compute_dtype"))
def greedy_with_prefix(
    params: Params,
    cfg: Config,
    samples: Masked,
    prefix: jax.Array,       # [B, P] int32 forced tokens (after BOS; 0-padded)
    prefix_lens: jax.Array,  # [B] int32 real length of each row's prefix
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    max_len: int = 128,
    bos_token: int = 101,
    eos_token: int = 102,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Greedy completion of per-sample forced prefixes (interactive / constrained
    generation): positions 1..prefix_lens[b] are fixed to ``prefix``, the rest
    decodes greedily with the same KV-cached loop. ``prefix_lens`` of zero makes
    this exactly ``greedy`` (tested); forced EOS tokens finish their row.

    The forced tokens still flow through the decode step (they must populate the
    self-attention caches), only the argmax is overridden inside the forced
    region — one compiled program regardless of the prefix pattern.
    """
    memory, mem_mask, pos = caption.encode(
        params, cfg, samples, global_samples=global_samples, loc_feats=loc_feats,
        compute_dtype=compute_dtype,
    )
    params, memory, pos = _cast_for_decode(params, memory, pos, compute_dtype)
    b_real = memory.shape[0]
    pad = _kernel_row_padding(cfg, b_real)
    memory, mem_mask = _pad_rows(memory, mem_mask, pad)
    if pad:
        prefix = jnp.pad(prefix, ((0, pad), (0, 0)))
        prefix_lens = jnp.pad(prefix_lens, (0, pad))
    b = memory.shape[0]
    p = prefix.shape[1]
    cache, cross = transformer.init_decode_state(
        params["transformer"], memory, mem_mask, pos, cfg, max_len
    )
    captions = jnp.zeros((b, max_len), jnp.int32).at[:, 0].set(bos_token)
    cols = jnp.arange(p)[None, :]
    captions = captions.at[:, 1 : p + 1].set(
        jnp.where(cols < prefix_lens[:, None], prefix, 0)
    )

    def cond(c: _GreedyCarry):
        return jnp.logical_and(c.step < max_len - 1, ~jnp.all(c.finished))

    def body(c: _GreedyCarry):
        hs, cache = transformer.decode_step(
            params["transformer"], c.cache, cross, c.captions[:, c.step], c.step, cfg
        )
        logits = caption.mlp_head(params["mlp"], hs)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        forced = c.step + 1 <= prefix_lens          # position step+1 is in the prefix
        tok = jnp.where(forced, c.captions[:, c.step + 1], pred)
        finished = jnp.logical_or(tok == eos_token, c.finished)
        write = ~jnp.all(finished)
        captions = jnp.where(write, c.captions.at[:, c.step + 1].set(tok), c.captions)
        return _GreedyCarry(captions, finished, cache, c.step + 1)

    init = _GreedyCarry(captions, _initial_finished(b_real, pad), cache, jnp.int32(0))
    with matmul_precision(memory.dtype):
        out = jax.lax.while_loop(cond, body, init)
    return out.captions[:b_real]


# ---------------------------------------------------------------------------------
# Stochastic sampling (extension; the reference is greedy-only)
# ---------------------------------------------------------------------------------


class _SampleCarry(NamedTuple):
    captions: jax.Array
    finished: jax.Array
    cache: transformer.DecodeCache
    key: jax.Array
    step: jax.Array


@_normalize_static_cfg
@partial(
    jax.jit,
    static_argnames=("cfg", "max_len", "bos_token", "eos_token", "temperature",
                     "top_k", "top_p", "compute_dtype"),
)
def sample(
    params: Params,
    cfg: Config,
    samples: Masked,
    key: jax.Array,
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    max_len: int = 128,
    bos_token: int = 101,
    eos_token: int = 102,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Ancestral sampling with temperature / top-k / nucleus (top-p) filtering.

    Same KV-cached loop and write/stop semantics as ``greedy`` (BOS slot 0, token
    written at step+1, post-EOS writes for still-running batches); ``temperature=0``
    or ``top_k=1`` reduce exactly to argmax. Filters compose the standard way:
    logits are truncated to the top-k set, then to the smallest prefix with
    cumulative probability >= top_p, then renormalized by softmax sampling.
    """
    memory, mem_mask, pos = caption.encode(
        params, cfg, samples, global_samples=global_samples, loc_feats=loc_feats,
        compute_dtype=compute_dtype,
    )
    params, memory, pos = _cast_for_decode(params, memory, pos, compute_dtype)
    b_real = memory.shape[0]
    pad = _kernel_row_padding(cfg, b_real)
    memory, mem_mask = _pad_rows(memory, mem_mask, pad)
    b = memory.shape[0]
    cache, cross = transformer.init_decode_state(
        params["transformer"], memory, mem_mask, pos, cfg, max_len
    )
    captions = jnp.zeros((b, max_len), jnp.int32).at[:, 0].set(bos_token)
    neg_inf = jnp.float32(-1e30)
    greedy_mode = temperature <= 0.0 or top_k == 1

    def cond(c: _SampleCarry):
        return jnp.logical_and(c.step < max_len - 1, ~jnp.all(c.finished))

    def body(c: _SampleCarry):
        hs, cache = transformer.decode_step(
            params["transformer"], c.cache, cross, c.captions[:, c.step], c.step, cfg
        )
        logits = caption.mlp_head(params["mlp"], hs).astype(jnp.float32)  # [B, V]
        if greedy_mode:
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            key = c.key
        elif 0 < top_k < logits.shape[-1]:
            # shortlist path: softmax of top-k-filtered logits == the renormalized
            # shortlist distribution, and a top-p cut after top-k only has mass on
            # the k kept entries — so filtering AND the categorical both run on the
            # [B, k] shortlist, never materializing filtered [B, V] logits
            # (measured 149 -> 262 captions/s at batch 32 / k=50 / 30522 vocab).
            vals, idx = jax.lax.top_k(logits / jnp.float32(temperature), top_k)
            if top_p < 1.0:
                probs = jax.nn.softmax(vals, axis=-1)       # vals sorted desc
                cum = jnp.cumsum(probs, axis=-1)
                # keep the smallest prefix reaching top_p (always >= 1 token)
                keep = jnp.concatenate(
                    [jnp.ones_like(cum[:, :1], bool), cum[:, :-1] < top_p], axis=-1
                )
                vals = jnp.where(keep, vals, neg_inf)
            key, sub = jax.random.split(c.key)
            choice = jax.random.categorical(sub, vals, axis=-1)  # [B] in [0, k)
            pred = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
        else:
            z = logits / jnp.float32(temperature)
            if top_p < 1.0:
                sorted_z = jnp.sort(z, axis=-1)[:, ::-1]
                probs = jax.nn.softmax(sorted_z, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                # keep the smallest prefix reaching top_p (always >= 1 token)
                keep = jnp.concatenate(
                    [jnp.ones_like(cum[:, :1], bool), cum[:, :-1] < top_p], axis=-1
                )
                cutoff = jnp.min(jnp.where(keep, sorted_z, jnp.inf), axis=-1, keepdims=True)
                z = jnp.where(z < cutoff, neg_inf, z)
            key, sub = jax.random.split(c.key)
            pred = jax.random.categorical(sub, z, axis=-1).astype(jnp.int32)
        finished = jnp.logical_or(pred == eos_token, c.finished)
        write = ~jnp.all(finished)
        captions = jnp.where(
            write, c.captions.at[:, c.step + 1].set(pred), c.captions
        )
        return _SampleCarry(captions, finished, cache, key, c.step + 1)

    init = _SampleCarry(captions, _initial_finished(b_real, pad), cache, key, jnp.int32(0))
    with matmul_precision(memory.dtype):
        out = jax.lax.while_loop(cond, body, init)
    return out.captions[:b_real]


# ---------------------------------------------------------------------------------
# Sequence scoring (extension; the reference computes only a scalar CE loss)
# ---------------------------------------------------------------------------------


@_normalize_static_cfg
@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def sequence_scores(
    params: Params,
    cfg: Config,
    samples: Masked,
    caps: jax.Array,        # [B, T] int32 token buffers (BOS first, 0-padded)
    cap_masks: jax.Array,   # [B, T] bool, True = pad
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Per-token log-probabilities of given captions under the model.

    One teacher-forced forward (the same shift semantics as training:
    input caps[:, :-1] -> predict caps[:, 1:], engine.py:70-71), log_softmax in
    f32, gather at the target ids. Returns ``(logprobs [B, T-1], valid [B, T-1])``
    where ``valid`` marks real (non-pad) target positions. Sum where valid for the
    sequence log-likelihood; exp(-mean) for perplexity. Use to rerank beam/sample
    candidates or compare candidate referring expressions for one region.
    """
    logits = caption.forward(
        params, cfg, samples, caps[:, :-1], cap_masks[:, :-1],
        global_samples=global_samples, loc_feats=loc_feats,
        train=False, compute_dtype=compute_dtype,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, caps[:, 1:][..., None], axis=-1)[..., 0]
    return tok_lp, ~cap_masks[:, 1:]


# ---------------------------------------------------------------------------------
# Beam search (north-star extension; not in the reference)
# ---------------------------------------------------------------------------------


class _BeamCarry(NamedTuple):
    tokens: jax.Array       # [B, K, L]
    scores: jax.Array       # [B, K] cumulative log-prob
    finished: jax.Array     # [B, K] bool
    fin_len: jax.Array      # [B, K] f32 first-EOS position (0 = still live) — kept
    #                         incrementally so the early-stop cond is O(B*K), not
    #                         an O(B*K*L) token-buffer scan every step
    cache: transformer.DecodeCache  # self caches with leading dim B*K, NEVER reordered
    anc: jax.Array          # [B, K, L] int32 ancestry (cache row that wrote position t)
    step: jax.Array


def beam_search_from_memory(
    params: Params,
    cfg: Config,
    memory: jax.Array,
    mem_mask: jax.Array,
    pos: jax.Array,
    *,
    max_len: int,
    bos_token: int,
    eos_token: int,
    beam_size: int,
    length_penalty: float = 1.0,
    early_stop: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Standard beam search with length normalization score/len**alpha.

    Returns (tokens [B, K, L] sorted best-first, normalized scores [B, K]).
    Finished beams are frozen (forced to re-emit EOS with zero added score).

    The self caches are NEVER physically reordered on beam reorder — each beam
    row writes its own slot and attention reads position t from the ancestor row
    recorded in the [B, K, L] ancestry matrix (transformer.decode_step_beam).
    Round 1 gathered all 12 self caches every step, which measured at ~258 ms of
    the 531 ms batch-32/k=5 decode (tools/exp_r2.py); the ancestry carry is 80 KB
    instead.

    ``early_stop`` (default on) terminates the loop before every beam finishes,
    per batch element, once some beam has finished and no live beam can plausibly
    change the kept results: a live beam keeps the loop alive only while it could
    still (a) outrank the worst finished beam under the normalized score, taking
    its BEST-CASE normalized score as cur_score / min_possible_length**alpha
    (finishing right now — the standard beam-scorer termination heuristic; for
    alpha > 0 a live beam could in principle normalize better by finishing much
    longer at near-zero added log-prob, which this heuristic ignores), or
    (b) evict a finished beam from the kept set under the RAW in-loop top-k
    score (raw log-prob only decreases, so this part is exact). In practice the
    finished rows — in particular the top hypothesis every consumer reads — match
    the exhaustive run (tests/test_caption.py guard pins a seeded batch); only
    never-finished tail rows stop extending earlier.
    """
    b, s, c = memory.shape
    k = beam_size
    neg_inf = jnp.float32(-1e9)

    # tile memory across beams: [B*K, S, C]. The cross K/V computed from it are
    # IDENTICAL across a batch element's beams, so they are never reordered; the
    # self caches use ancestry addressing instead of reordering.
    mem_t = jnp.repeat(memory, k, axis=0)
    mask_t = jnp.repeat(mem_mask, k, axis=0)
    cache, cross = transformer.init_decode_state(
        params["transformer"], mem_t, mask_t, pos, cfg, max_len,
        allow_layer_grid=False,  # decode_step_beam needs per-layer caches
    )

    tokens = jnp.zeros((b, k, max_len), jnp.int32).at[:, :, 0].set(bos_token)
    scores = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, neg_inf) * jnp.ones((b, 1))
    finished = jnp.zeros((b, k), bool)
    anc = jnp.zeros((b, k, max_len), jnp.int32)

    use_topk_head = False
    if transformer._pallas_decode_eligible(cfg, b * k):
        from retr_tpu.ops import decoder_kernels as dk

        use_topk_head = dk.BEAM_TOPK_KERNEL and (
            dk.FORCE_INTERPRET or jax.default_backend() != "cpu"
        )

    lp = jnp.float32(length_penalty)

    def cond(cst: _BeamCarry):
        if not early_stop:
            return jnp.logical_and(cst.step < max_len - 1, ~jnp.all(cst.finished))
        all_fin = jnp.all(cst.finished, axis=-1)                      # [B]
        any_fin = jnp.any(cst.finished, axis=-1)                      # [B]
        # finished beams' FINAL normalized scores (same length rule as the
        # post-loop ranking: first-EOS position counts tokens after BOS incl EOS)
        fin_norm = cst.scores / jnp.maximum(cst.fin_len, 1.0) ** lp
        worst_fin = jnp.min(jnp.where(cst.finished, fin_norm, jnp.inf), axis=-1)
        fin_raw_min = jnp.min(jnp.where(cst.finished, cst.scores, jnp.inf), axis=-1)
        # live beams' best-case normalized score under the finish-NOW heuristic:
        # raw log-prob only decreases, min possible finish length is step+1
        live = ~cst.finished
        len_lo = jnp.maximum(cst.step.astype(jnp.float32) + 1.0, 1.0)
        bound = cst.scores / len_lo ** lp
        can_win = jnp.any(jnp.where(live, bound, -jnp.inf) >= worst_fin[:, None],
                          axis=-1)
        can_evict = jnp.any(jnp.where(live, cst.scores, -jnp.inf)
                            >= fin_raw_min[:, None], axis=-1)
        elem_active = ~all_fin & (~any_fin | can_win | can_evict)
        return jnp.logical_and(cst.step < max_len - 1, jnp.any(elem_active))

    def body(cst: _BeamCarry):
        cur = cst.tokens[:, :, cst.step].reshape(b * k)
        # position `step` is written by each beam's own row this step
        anc = cst.anc.at[:, :, cst.step].set(jnp.arange(k, dtype=jnp.int32)[None, :])
        hs, cache = transformer.decode_step_beam(
            params["transformer"], cst.cache, cross, cur, cst.step, cfg, anc, k
        )
        if use_topk_head:
            from retr_tpu.ops import decoder_kernels as dk

            # fused head tail: last matmul + per-row top-k + logsumexp in one
            # vocab-blocked kernel — the [B*K, V] logits never reach HBM. Token
            # selection is exact (raw logit values, first-index ties); the
            # winners' log-probs differ from the flat path only by logsumexp
            # summation association (f32 rounding).
            row_scores, row_tokens = dk.mlp_head_topk(
                params["mlp"], hs, k, interpret=dk.FORCE_INTERPRET
            )
            row_scores = row_scores.reshape(b, k, k)
            row_tokens = row_tokens.reshape(b, k, k).astype(jnp.int32)
        else:
            logits = caption.mlp_head(params["mlp"], hs).astype(jnp.float32)  # [B*K, V]

            # two-stage top-k: the global k best continuations include at most k
            # per beam, so take per-beam top-k over the vocab first and combine
            # the [K, K] shortlist — never materializing the [B, K*V] candidate
            # matrix. top_k runs on the RAW logits (the per-row logsumexp shift
            # preserves order and ties), so the full [B*K, V] log_softmax array
            # is never materialized; log-probs are computed for the k winners
            # only — bitwise identical values (subtraction commutes with gather).
            row_logits, row_tokens = jax.lax.top_k(logits, k)    # [B*K, K]
            # exact log_softmax association (x - m) - log(sum(exp(x - m))) so the
            # winner values are bitwise what gathering log_softmax would give
            m = jnp.max(logits, axis=-1, keepdims=True)
            log_z = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
            row_scores = ((row_logits - m) - log_z).reshape(b, k, k)
            row_tokens = row_tokens.reshape(b, k, k).astype(jnp.int32)

        # finished beams: single EOS continuation with no score change.
        fin = cst.finished[:, :, None]
        first_slot = jnp.arange(k)[None, None, :] == 0
        row_scores = jnp.where(fin, jnp.where(first_slot, 0.0, neg_inf), row_scores)
        row_tokens = jnp.where(fin, eos_token, row_tokens)

        cand = cst.scores[:, :, None] + row_scores           # [B, K, K]
        flat = cand.reshape(b, k * k)
        top_scores, top_idx = jax.lax.top_k(flat, k)         # [B, K]
        beam_idx = top_idx // k
        tok_idx = jnp.take_along_axis(row_tokens.reshape(b, k * k), top_idx, axis=1)

        tokens = jnp.take_along_axis(cst.tokens, beam_idx[:, :, None], axis=1)
        tokens = tokens.at[:, :, cst.step + 1].set(tok_idx)
        prev_fin = jnp.take_along_axis(cst.finished, beam_idx, axis=1)
        finished = jnp.logical_or(prev_fin, tok_idx == eos_token)
        # first-EOS position for beams finishing THIS step = the slot just written
        fin_len = jnp.take_along_axis(cst.fin_len, beam_idx, axis=1)
        fin_len = jnp.where(~prev_fin & (tok_idx == eos_token),
                            (cst.step + 1).astype(jnp.float32), fin_len)
        # reorder the 80KB ancestry matrix instead of the ~250MB of caches
        anc = jnp.take_along_axis(anc, beam_idx[:, :, None], axis=1)
        return _BeamCarry(tokens, top_scores, finished, fin_len, cache, anc,
                          cst.step + 1)

    init = _BeamCarry(tokens, scores, finished, jnp.zeros((b, k), jnp.float32),
                      cache, anc, jnp.int32(0))
    with matmul_precision(memory.dtype):
        out = jax.lax.while_loop(cond, body, init)

    # length-normalized final ranking: length counts tokens after BOS up to & incl EOS.
    is_eos = out.tokens == eos_token
    has_eos = jnp.any(is_eos, axis=-1)
    eos_pos = jnp.argmax(is_eos, axis=-1)
    length = jnp.where(has_eos, eos_pos, max_len - 1).astype(jnp.float32)
    norm = out.scores / jnp.maximum(length, 1.0) ** length_penalty
    order = jnp.argsort(-norm, axis=-1)
    tokens = jnp.take_along_axis(out.tokens, order[:, :, None], axis=1)
    norm = jnp.take_along_axis(norm, order, axis=1)
    return tokens, norm


@_normalize_static_cfg
@partial(
    jax.jit,
    static_argnames=("cfg", "max_len", "bos_token", "eos_token", "beam_size",
                     "compute_dtype", "early_stop"),
)
def beam_search(
    params: Params,
    cfg: Config,
    samples: Masked,
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    max_len: int = 128,
    bos_token: int = 101,
    eos_token: int = 102,
    beam_size: int = 5,
    length_penalty: float = 1.0,
    compute_dtype=jnp.float32,
    early_stop: bool = True,
):
    memory, mem_mask, pos = caption.encode(
        params, cfg, samples, global_samples=global_samples, loc_feats=loc_feats,
        compute_dtype=compute_dtype,
    )
    params, memory, pos = _cast_for_decode(params, memory, pos, compute_dtype)
    return beam_search_from_memory(
        params, cfg, memory, mem_mask, pos,
        max_len=max_len, bos_token=bos_token, eos_token=eos_token,
        beam_size=beam_size, length_penalty=length_penalty, early_stop=early_stop,
    )


# ---------------------------------------------------------------------------------
# Post-processing (host-side)
# ---------------------------------------------------------------------------------


def prune_token_ids(
    idx_seqs: Sequence[Sequence[int]],
    clean: bool = True,
    pad_token: int = 0,
    bos_token: int = 101,
    eos_token: int = 102,
) -> List[List[int]]:
    """Cut each sequence at its first EOS; optionally strip PAD/BOS/EOS
    (reference decode.py:84-101)."""
    results = []
    for seq in idx_seqs:
        pruned = []
        for idx in seq:
            pruned.append(int(idx))
            if idx == eos_token:
                break
        if clean:
            pruned = [i for i in pruned if i not in (pad_token, bos_token, eos_token)]
        results.append(pruned)
    return results


def greedy_single(
    params: Params,
    cfg: Config,
    samples: Masked,
    tokenizer,
    **kwargs,
) -> str:
    """Single-image greedy decode -> decoded string (reference greedy_single,
    decode.py:30-50). Thin wrapper over the batched path (batch dim of 1)."""
    sents = greedy_decoding(samples, params, cfg, tokenizer, **kwargs)
    return sents[0]


def greedy_with_attention(
    params: Params,
    cfg: Config,
    samples: Masked,
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    max_len: int = 128,
    bos_token: int = 101,
    eos_token: int = 102,
    compute_dtype=jnp.float32,
):
    """Greedy decode + attention maps (reference greedy_with_att, decode.py:131-167).

    The reference re-runs the full model per step and collects one attention dict per
    step; position i of each returned map there equals row i of the full-sequence
    maps here, so ONE teacher-forced forward over the decoded buffer reproduces the
    same information without 127 model recomputes. Returns (token_ids [B, L], atts)
    with atts keyed enc_tc_self_att / dec_exp_self_att / dec_exp_tc_cross_att
    ([L_layers, B, T, S]-shaped stacks, ConcatTransformer.py:72-73).
    """
    ids = greedy(
        params, cfg, samples, global_samples=global_samples, loc_feats=loc_feats,
        max_len=max_len, bos_token=bos_token, eos_token=eos_token,
        compute_dtype=compute_dtype,
    )
    pad_mask = ids == 0
    from retr_tpu.models.caption import forward as caption_forward

    _, atts = caption_forward(
        params, cfg, samples, ids, pad_mask,
        global_samples=global_samples, loc_feats=loc_feats,
        return_attention=True, compute_dtype=compute_dtype,
    )
    return ids, atts


def greedy_decoding(
    samples: Masked,
    params: Params,
    cfg: Config,
    tokenizer,
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    max_len: int = 128,
    clean: bool = True,
    pad_token: int = 0,
    bos_token: int = 101,
    eos_token: int = 102,
    compute_dtype=jnp.float32,
) -> List[str]:
    """Reference greedy_decoding (decode.py:112-128): decode, prune, detokenize."""
    ids = greedy(
        params, cfg, samples, global_samples=global_samples, loc_feats=loc_feats,
        max_len=max_len, bos_token=bos_token, eos_token=eos_token,
        compute_dtype=compute_dtype,
    )
    pruned = prune_token_ids(
        jax.device_get(ids).tolist(), clean=clean,
        pad_token=pad_token, bos_token=bos_token, eos_token=eos_token,
    )
    return [tokenizer.decode(seq, skip_special_tokens=True) for seq in pruned]
