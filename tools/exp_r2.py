"""Round-2 TPU measurement harness: encoder-cost breakdown + beam-step bisect.

Timing discipline (docs/PERF.md): the axon transport acks dispatch before
execution, so EVERY timing forces a host fetch. Each measurement reports
ms/batch over `reps` pipelined calls after one warmup/compile call.

Run on the real chip:  python tools/exp_r2.py [encode|beam|all]
"""

from __future__ import annotations

import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from retr_tpu import decode
from retr_tpu.config import Config
from retr_tpu.masking import Masked
from retr_tpu.models import caption, transformer

BATCH, IMAGE, MAX_LEN = 32, 224, 128


def timeit(fn, *args, reps=5, label=""):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)  # compile + sync
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        jax.tree.map(lambda x: np.asarray(x), o)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:42s} {dt:9.2f} ms")
    return dt


def make_inputs(cfg, batch=BATCH, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.normal(size=(batch, 3, IMAGE, IMAGE)), jnp.float32)
    return Masked(img, jnp.zeros((batch, IMAGE, IMAGE), bool))


def encode_suite():
    """Every variant returns a SCALAR (sum) so the timing measures device compute,
    not the 6.4MB memory-tensor fetch through the tunnel."""
    cfg = Config(backbone="ResNet50", dilation=True, dropout=0.1, use_pallas_decode=True)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    samples = make_inputs(cfg)

    noop = jax.jit(lambda x: x + 1.0)
    timeit(noop, jnp.zeros((8, 8), jnp.float32), label="transport round trip (noop jit)")

    def s(x):
        return jnp.sum(x[0].astype(jnp.float32) if isinstance(x, tuple) else x.astype(jnp.float32))

    enc = jax.jit(lambda p, sm: s(caption.encode(p, cfg, sm)))
    t_enc = timeit(enc, params, samples, label="encode HIGHEST (backbone+encoder)")

    bb = jax.jit(lambda p, sm: s(caption.build_encoder_input(p, cfg, sm).src_t))
    t_bb = timeit(bb, params, samples, label="backbone-only HIGHEST")

    cfg_high = cfg.replace(backbone_precision="high")
    bb_h = jax.jit(lambda p, sm: s(caption.build_encoder_input(p, cfg_high, sm).src_t))
    timeit(bb_h, params, samples, label="backbone-only HIGH")

    enc_h = jax.jit(lambda p, sm: s(caption.encode(p, cfg_high, sm)))
    timeit(enc_h, params, samples, label="encode backbone=HIGH")

    enc_bf = jax.jit(lambda p, sm: s(caption.encode(p, cfg, sm, compute_dtype=jnp.bfloat16)))
    timeit(enc_bf, params, samples, label="encode bf16 (whole)")

    # encoder stack alone on a precomputed src
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(BATCH, 196, 256)), jnp.float32)
    mask = jnp.zeros((BATCH, 196), bool)
    enc_only = jax.jit(lambda p, x, m: s(transformer.encode(p["transformer"], x, m, cfg)[0]))
    timeit(enc_only, params, src, mask, label="6-layer encoder alone HIGHEST")

    print(f"-> encoder+proj share = encode - backbone = {t_enc - t_bb:.1f} ms")

    # greedy full for context
    g = lambda p, sm: decode.greedy(p, cfg, sm, max_len=MAX_LEN, bos_token=101,
                                    eos_token=cfg.vocab_size + 1)
    timeit(g, params, samples, label="greedy full (127 steps, pallas)")


def beam_suite():
    cfg = Config(backbone="ResNet50", dilation=True, dropout=0.1, use_pallas_decode=True,
                 beam_size=5)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    samples = make_inputs(cfg)
    k = cfg.beam_size

    bs = lambda p, s: decode.beam_search(
        p, cfg, s, max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
        beam_size=k)[0]
    t_full = timeit(bs, params, samples, label="beam k=5 (ancestry, 127 steps)")

    bs_bf = lambda p, s: decode.beam_search(
        p, cfg, s, max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
        beam_size=k, compute_dtype=jnp.bfloat16)[0]
    timeit(bs_bf, params, samples, label="beam k=5 bf16 (ancestry, 127 steps)")

    # --- isolated ops at beam shapes, 127 iterations inside one jit
    bk, v = BATCH * k, cfg.vocab_size
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(bk, v)), jnp.float32)

    @jax.jit
    def topk_loop(x):
        def body(i, acc):
            s, t = jax.lax.top_k(x + acc[:, :1] * 1e-6, k)
            return acc + s[:, :1]
        return jax.lax.fori_loop(0, 127, body, jnp.zeros((bk, 1), jnp.float32))

    timeit(topk_loop, logits, label="127x top_k([160,30522], 5)")

    # hierarchical exact top-k candidate: per-128-block top-k, then combine —
    # the global top-5 must be within each block's top-5, so this is exact.
    pad = (-(v) % 128)
    vp = v + pad

    @jax.jit
    def topk_hier_loop(x):
        xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)

        def body(i, acc):
            blocks = (xp + acc[:, :1] * 1e-6).reshape(bk, vp // 128, 128)
            bs, bi = jax.lax.top_k(blocks, k)              # [bk, nb, k]
            flat = bs.reshape(bk, -1)
            s2, i2 = jax.lax.top_k(flat, k)
            return acc + s2[:, :1]
        return jax.lax.fori_loop(0, 127, body, jnp.zeros((bk, 1), jnp.float32))

    timeit(topk_hier_loop, logits, label="127x hierarchical top_k(239x128 -> 1195)")

    @jax.jit
    def logsoftmax_loop(x):
        def body(i, acc):
            return acc + jax.nn.log_softmax(x + acc * 1e-9, axis=-1)[:, :1] * 0 + 1e-9
        return jax.lax.fori_loop(0, 127, body, jnp.zeros((bk, 1), jnp.float32))

    timeit(logsoftmax_loop, logits, label="127x log_softmax([160,30522])")

    print(f"\nbeam k=5 ancestry: {t_full:.1f} ms/batch = {BATCH / t_full * 1e3:.1f} captions/s "
          f"(round-1 gather impl: 531 ms = 60 captions/s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("device:", jax.devices()[0])
    if which in ("encode", "all"):
        encode_suite()
    if which in ("beam", "all"):
        beam_suite()
