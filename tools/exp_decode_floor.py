"""Decode-step bandwidth-floor map at large batch (the bandwidth-bound regime).

docs/LAUNCH_FLOOR.json answered the batch-32 question (launch overhead dominates
there). At batch 128+ the step is byte-bound instead, and the roofline's 0.39 ms
floor assumes unpadded reads and no cache write-back — neither holds in the real
kernels: cross K/V blocks pad S=196 to 256 lanes, and the self-attention kernel
writes the full cache block back every step (the T-on-lanes layout makes a
1-lane update touch every tile, so the full write-back IS the minimal write).

This probe measures, on the real chip with the differential fori-chain protocol
(retr_tpu.utils.timing):

  1. the chip's PRACTICAL stream ceiling (read-only reduce + read+write copy of
     a ~256 MB array) — the denominator "% of stream" is measured against this,
     not the paper 819 GB/s;
  2. each decode phase standalone at the flagship config (self_attn_block,
     cross_attn_block, ff_block, mlp_head_argmax) with its analytic byte count
     (padding and write-back included), giving achieved GB/s per phase;
  3. the integrated decode step (decode.greedy per-step) for the same batch.

Output: one JSON blob for docs/DECODE_FLOOR.json + a markdown table the
roofline report embeds. Run on an idle host.

Reference scope: the step decomposed here implements the reference's greedy
token loop (reference eval_utils/decode.py:53-81) over the decoder layer
semantics of reference models/transformer_modules.py:22-97.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_LEN = 128


def _lane_pad(n: int) -> int:
    return ((n + 127) // 128) * 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--k", type=int, default=64, help="chain depth for phases")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from retr_tpu.config import Config
    from retr_tpu import decode
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption
    from retr_tpu.ops import decoder_kernels as dk
    from retr_tpu.utils.timing import time_chained

    cfg = Config(backbone="ResNet50", dilation=True, dropout=0.1,
                 use_pallas_decode=True, compute_dtype="bfloat16")
    dt = jnp.bfloat16
    b, c, h = args.batch, cfg.hidden_dim, cfg.nheads
    d = c // h
    t = MAX_LEN
    s = 196  # 14x14 dilated ResNet50 feature grid at 224^2
    rng = np.random.default_rng(0)

    params, _ = caption.build_model(cfg, jax.random.key(0))
    layer = jax.tree.map(lambda a: a.astype(dt),
                         params["transformer"]["decoder"]["layers"][0])
    head_p = jax.tree.map(lambda a: a.astype(dt), params["mlp"])

    def arr(*shape, dtype=dt):
        return jnp.asarray(rng.normal(size=shape) * 0.02, dtype)

    out = {"batch": b, "device": str(jax.devices()[0])}

    # -- 1. practical stream ceiling ------------------------------------------------
    big = arr(64, 1024, 2048)  # 256 MB bf16
    t_read = time_chained(lambda x: x.sum(dtype=jnp.float32), big, k=8,
                          rounds=args.rounds)
    t_copy = time_chained(lambda x: x * jnp.bfloat16(1.0) + jnp.bfloat16(1e-8),
                          big, k=8, rounds=args.rounds)
    nbytes = big.size * 2
    out["stream"] = {
        "array_mb": round(nbytes / 1e6, 1),
        "read_gbps": round(nbytes / t_read / 1e9, 1),
        "copy_gbps": round(2 * nbytes / t_copy / 1e9, 1),
    }
    print("# stream", out["stream"], flush=True)

    # -- 2. per-phase ---------------------------------------------------------------
    x = arr(b, c)
    qpos = arr(c)
    kc = arr(h, b, d, t)
    vc = arr(h, b, d, t)
    ck = arr(b, h, s, d)   # CrossContext layout (transpose hoists out of the chain)
    cv = arr(b, h, s, d)
    kb = jnp.zeros((b, s), jnp.float32)
    step = jnp.int32(64)

    phases = {}

    def record(name, fn, x0, mbytes):
        tsec = time_chained(fn, x0, k=args.k, rounds=args.rounds)
        phases[name] = {
            "us": round(tsec * 1e6, 1),
            "floor_mb": round(mbytes, 1),
            "achieved_gbps": round(mbytes * 1e6 / tsec / 1e9, 1),
        }
        print(f"# {name}: {phases[name]}", flush=True)

    cache_mb = h * b * d * t * 2 / 1e6          # one cache array
    w_sa_mb = (4 * c * c) * 2 / 1e6
    record("self_attn_block",
           lambda x: dk.self_attn_block(layer["self_attn"], x, qpos, kc, vc,
                                        step, num_heads=h),
           x, 2 * cache_mb + 2 * cache_mb + w_sa_mb)  # read K+V, write K+V back

    cross_mb = h * b * d * _lane_pad(s) * 2 / 1e6  # lane-padded block reads
    record("cross_attn_block",
           lambda x: dk.cross_attn_block(layer["cross_attn"], x, qpos, ck, cv,
                                         kb, num_heads=h),
           x, 2 * cross_mb + (2 * c * c) * 2 / 1e6)

    ff_mb = (c * cfg.dim_feedforward * 2) * 2 / 1e6
    record("ff_block", lambda x: dk.ff_block(layer["ff"], x), x, ff_mb)

    hh = head_p["layers"][1]["w"].shape[0]  # 512 head hidden
    vpad = ((cfg.vocab_size + 2047) // 2048) * 2048
    head_mb = (c * hh + hh * hh + hh * vpad) * 2 / 1e6
    record("mlp_head_argmax",
           lambda x: dk.mlp_head_argmax(head_p, x), x, head_mb)

    n_layers = cfg.dec_layers
    sum_us = n_layers * (phases["self_attn_block"]["us"]
                         + phases["cross_attn_block"]["us"]
                         + phases["ff_block"]["us"]) + phases["mlp_head_argmax"]["us"]
    floor_mb = n_layers * (phases["self_attn_block"]["floor_mb"]
                           + phases["cross_attn_block"]["floor_mb"]
                           + phases["ff_block"]["floor_mb"]) + phases["mlp_head_argmax"]["floor_mb"]
    out["phases"] = phases
    out["sum_of_phases_us"] = round(sum_us, 1)
    out["step_floor_mb"] = round(floor_mb, 1)

    # -- 3. integrated step ---------------------------------------------------------
    img = jnp.asarray(rng.normal(size=(b, 3, 224, 224)), jnp.float32)
    samples = Masked(img, jnp.zeros((b, 224, 224), dtype=bool))
    gkw = dict(max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
               compute_dtype=dt)
    t_full = time_chained(
        lambda smp: decode.greedy(params, cfg, smp, **gkw).astype(jnp.float32),
        samples, k=3, rounds=args.rounds)
    t_enc = time_chained(
        lambda smp: caption.encode(params, cfg, smp, compute_dtype=dt)[0],
        samples, k=16, rounds=args.rounds)
    step_us = (t_full - t_enc) / (MAX_LEN - 1) * 1e6
    out["measured_step_us"] = round(step_us, 1)
    out["step_achieved_gbps"] = round(floor_mb * 1e6 / (step_us / 1e6) / 1e9, 1)
    out["stream_ceiling_step_us"] = round(
        floor_mb * 1e6 / (out["stream"]["copy_gbps"] * 1e9) * 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
