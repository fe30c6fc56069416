"""Greedy-decode batch-scaling probe: does batch >128 keep amortizing the
fusion-count-bound per-step overhead (docs/PERF.md)?

The decode step's cost is dominated by fixed per-fusion/per-kernel launch
overhead, which is independent of the batch dimension — so captions/s rises
with batch until bytes/FLOPs take over. Batch 512 is the current headline
(BENCH_r04.json; the measured curve plateaus 384→512 within ~0.5%). This probe
measures 128/192/256/384/512 under the same protocol as bench.py (EOS
unreachable -> full 127 steps; 5 batches in flight; median of 3 rounds) and
checks token invariance vs the first batch.

Invariance caveat (measured, docs/PERF.md r4): with bf16 compute the RANDOM
weights used here flip ~2.8% of positions across batch sizes — argmax near-ties
(f32 top-2 margins ~1e-3) resolved differently across batch-dependent XLA
tilings once the memory is bf16-rounded. tools/exp_inv_flips.py is the
diagnostic; f32 mode and trained checkpoints are exactly batch-invariant, so a
`false` here on random weights is expected in bf16, not a bug signal.

Run on an idle host (no concurrent pytest).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMAGE, MAX_LEN = 224, 128


def flagship():
    from retr_tpu.config import Config

    return Config(backbone="ResNet50", dilation=True, dropout=0.1,
                  use_pallas_decode=True, compute_dtype="bfloat16")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[128, 192, 256, 384, 512])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--decoder", default="greedy", choices=["greedy", "beam", "sample"],
                    help="beam tiles the batch to B*beam_size rows (5x), so its "
                    "row count — and the ff-block VMEM ceiling at 384 rows — is "
                    "hit at batch ~76")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from retr_tpu import decode
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption

    cfg = flagship()
    params, _ = caption.build_model(cfg, jax.random.key(0))
    kwargs = dict(max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
                  compute_dtype=jnp.dtype(cfg.compute_dtype))

    def run(samples):
        if args.decoder == "greedy":
            return decode.greedy(params, cfg, samples, **kwargs)
        if args.decoder == "beam":
            tokens, _ = decode.beam_search(params, cfg, samples,
                                           beam_size=cfg.beam_size, **kwargs)
            return tokens[:, 0]
        return decode.sample(params, cfg, samples, jax.random.key(7), **kwargs)

    rng = np.random.default_rng(0)
    base = rng.normal(size=(max(args.batches), 3, IMAGE, IMAGE)).astype(np.float32)

    # batch-invariance check: the first min(32, smallest batch) rows must decode
    # identically at every batch size (slicing both sides to the same row count —
    # a first batch under 32 must not fail the comparison on shape)
    inv_rows = min(32, min(args.batches))
    ref_tokens = None
    results = {}
    for b in args.batches:
        img = jnp.asarray(base[:b])
        samples = Masked(img, jnp.zeros((b, IMAGE, IMAGE), dtype=bool))
        ids = run(samples)
        toks = np.asarray(ids)  # compile + warmup (host fetch = real barrier)
        if ref_tokens is None:
            ref_tokens = toks[:inv_rows]
            inv = True
        else:
            inv = bool(np.array_equal(toks[:inv_rows], ref_tokens))

        dts = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            outs = [run(samples) for _ in range(args.reps)]
            for o in outs:
                np.asarray(o)
            dts.append((time.perf_counter() - t0) / args.reps)
        dt = float(np.median(dts))
        results[b] = {"ms_per_batch": round(dt * 1e3, 1),
                      "captions_per_sec": round(b / dt, 1),
                      "tokens_match_first_rows": inv}
        print(json.dumps({"batch": b, **results[b]}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
