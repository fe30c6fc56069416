"""Round-5 perf experiments (run on the real chip; numbers land in docs/PERF.md).

Modes:
  --beam-es-ab     beam k=5 early-termination A/B on the TRAINED checkpoint
                   (decode.beam_search early_stop True vs False, VERDICT r4
                   item 6): interleaved reps so tunnel weather cancels, top-
                   hypothesis equality asserted. Trained weights are the case
                   that matters — beams actually finish, so the loop can stop
                   when stragglers can no longer win; on random weights no beam
                   ever finishes and both modes run all 127 steps.
  --remat-ab       train-step A/B: cfg.remat on/off at the largest batches
                   (VERDICT r4 item 4): measures the memory/throughput trade
                   and whether remat unlocks batch 256 (grad-accum is the
                   previous sanctioned path past the OOM).
  --layer-grid-batch-ab  LAYER_GRID single-launch decoder kernel past its r4
                   b<=32 gate vs the split kernels, per batch + batch-block
                   sweep (VERDICT r4 item 1); chained-step device protocol.

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
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_e2e import make_fixture  # noqa: E402

MAX_LEN = 128


def load_trained(ckpt_dir: str, dtype: str):
    import jax
    import jax.numpy as jnp

    from retr_tpu.models import caption
    from retr_tpu.train import checkpoints as ckpt_mod
    from retr_tpu.train.state import TrainState, make_optimizer

    cfg = ckpt_mod.config_from_checkpoint(ckpt_dir).replace(
        compute_dtype=dtype, use_pallas_decode=True)
    template, _ = caption.build_model(cfg, jax.random.key(0))
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state, _ = ckpt_mod.load_checkpoint(
        ckpt_dir, TrainState(template, tx.init(template), jnp.int32(0)))
    return state.params, cfg


def beam_es_ab(args):
    import jax
    import jax.numpy as jnp

    from retr_tpu import decode
    from retr_tpu.data import dataset as ds
    from retr_tpu.data.pipeline import device_batch
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.masking import Masked

    tok, bos, eos = prepare_tokenizer()
    if args.random:
        # bench.py's worst case: random weights, EOS effectively unreachable, all
        # 127 steps run in BOTH modes — isolates the early-stop cond's overhead
        from retr_tpu.config import Config
        from retr_tpu.models import caption

        cfg = Config(backbone=args.backbone, dilation=True, dropout=0.1,
                     use_pallas_decode=True, compute_dtype=args.dtype,
                     vocab_size=tok.vocab_size)
        params, _ = caption.build_model(cfg, jax.random.key(0))
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(args.batch, 3, 224, 224)), jnp.float32)
        samples = Masked(img, jnp.zeros((args.batch, 224, 224), bool))
        eos = cfg.vocab_size + 1  # unreachable, like bench.py
    else:
        params, cfg = load_trained(args.ckpt, args.dtype)
        coco_dir, ref_dir = make_fixture(args.fixture_dir, args.images)
        cfg = cfg.replace(dir=coco_dir, ref_dir=ref_dir, batch_size=args.batch)
        eval_set = ds.build_dataset(cfg, "val", tokenizer=tok, return_unique=True)
        loader = ds.DataLoader(eval_set, args.batch, num_workers=4, drop_last=True)
        host = next(iter(loader))
        batch = device_batch(host, train=False)
        imgs = batch.images
        if args.noise_sigma:
            # straggler proxy: perturb the memorized images so top beams still
            # finish (the model half-recognizes them) while weak beams wander
            # without emitting EOS — the real-data mixture where the exhaustive
            # loop runs to max_len but early stop cuts out once the wanderers'
            # per-token cost decays below each element's worst finished beam.
            rng = np.random.default_rng(7)
            imgs = imgs + args.noise_sigma * jnp.asarray(
                rng.normal(size=imgs.shape), imgs.dtype)
        samples = Masked(imgs, batch.image_masks)

    def run(es: bool):
        toks, scores = decode.beam_search(
            params, cfg, samples, max_len=MAX_LEN, bos_token=bos, eos_token=eos,
            beam_size=args.k, length_penalty=cfg.length_penalty,
            compute_dtype=jnp.dtype(cfg.compute_dtype), early_stop=es)
        return toks

    # compile + top-hypothesis equality (pruned at first EOS)
    tops = {}
    for es in (False, True):
        t = np.asarray(run(es))[:, 0]
        pruned = decode.prune_token_ids(t.tolist(), clean=True, pad_token=0,
                                        bos_token=bos, eos_token=eos)
        tops[es] = pruned
    eq = tops[False] == tops[True]

    results = {False: [], True: []}
    for _ in range(args.rounds):
        for es in (False, True):  # interleaved: same tunnel weather per round
            t0 = time.perf_counter()
            outs = [run(es) for _ in range(args.reps)]
            for o in outs:
                np.asarray(o)
            results[es].append((time.perf_counter() - t0) / args.reps)

    out = {"top_hypotheses_equal": bool(eq), "batch": args.batch, "k": args.k,
           "length_penalty": cfg.length_penalty, "dtype": args.dtype,
           "weights": "random (full 127 steps)" if args.random else "trained ckpt"}
    for es in (False, True):
        dt = float(np.median(results[es]))
        out["early_stop_on" if es else "exhaustive"] = {
            "ms_per_batch": round(dt * 1e3, 1),
            "captions_per_sec": round(args.batch / dt, 1),
        }
    on = out["early_stop_on"]["captions_per_sec"]
    off = out["exhaustive"]["captions_per_sec"]
    out["speedup"] = round(on / off, 3)
    print(json.dumps({"beam_early_stop_ab": out}, indent=2))
    return out


def remat_ab(args):
    import jax
    import jax.numpy as jnp

    from retr_tpu.config import Config
    from retr_tpu.models import caption
    from retr_tpu.train.state import Batch, TrainState, make_optimizer, make_train_step

    base = Config(backbone=args.backbone, dilation=True, dropout=0.1,
                  compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    out = {}
    for batch_size in args.batches:
        row = {}
        for name, remat in (("no_remat", False), ("remat", True)):
            cfg = base.replace(remat=remat)
            params, _ = caption.build_model(cfg, jax.random.key(0))
            tx = make_optimizer(cfg, steps_per_epoch=100)
            state = TrainState(params, tx.init(params), jnp.int32(0))
            step = make_train_step(cfg, tx, donate=True, memo=False)
            imgs = jnp.asarray(rng.normal(size=(batch_size, 3, 224, 224)), jnp.float32)
            masks = jnp.zeros((batch_size, 224, 224), bool)
            caps = jnp.asarray(
                rng.integers(1, cfg.vocab_size, (batch_size, cfg.max_position_embeddings + 1)),
                jnp.int32)
            cap_masks = jnp.zeros_like(caps, bool)
            b = Batch(images=imgs, image_masks=masks, caps=caps, cap_masks=cap_masks,
                      global_images=None, global_masks=None, loc_feats=None)
            key = jax.random.key(0)
            try:
                state, loss = step(state, b, key)  # compile + first step
                float(loss)
                dts = []
                for _ in range(args.rounds):
                    t0 = time.perf_counter()
                    for _ in range(args.reps):
                        state, loss = step(state, b, key)
                    float(loss)  # barrier
                    dts.append((time.perf_counter() - t0) / args.reps)
                dt = float(np.median(dts))
                row[name] = {"ms_per_step": round(dt * 1e3, 1),
                             "samples_per_sec": round(batch_size / dt, 1)}
            except Exception as exc:  # noqa: BLE001 — OOM rows are the finding
                row[name] = {"error": type(exc).__name__,
                             "detail": str(exc).splitlines()[0][:160]}
            del state, params
        out[f"batch_{batch_size}"] = row
        print(json.dumps({f"batch_{batch_size}": row}), flush=True)
    print(json.dumps({"remat_ab": out}, indent=2))
    return out


def layer_grid_batch_ab(args):
    """VERDICT r4 item 1: the LAYER_GRID single-launch decoder kernel past its
    r4 b<=32 gate (batch-blocked grid, ops/decoder_kernels.fused_stack_step) vs
    the split per-block kernels, per batch, with a batch-block-size sweep.
    Protocol = roofline.measure_decode_steps (chained (cache, tok) loop body,
    true device time). Tokens equality between paths is covered by
    tests/test_decoder_kernels.py (interpret) and the greedy cross-path test;
    here both arms also run from the same memory so drift would be visible in
    the argmax chain anyway."""
    from roofline import measure_decode_steps

    from retr_tpu.ops import decoder_kernels as dk

    out = {}
    for b in args.batches:
        row = {}
        split = measure_decode_steps([b], args.reps, args.rounds,
                                     allow_layer_grid=False)[str(b)]
        row["split_kernels_ms"] = round(split * 1e3, 3)
        if args.xla_arm:
            xla = measure_decode_steps([b], args.reps, args.rounds,
                                       use_pallas=False)[str(b)]
            row["xla_path_ms"] = round(xla * 1e3, 3)
        # LAYER_GRID arm only where the single-launch kernel can run (one batch
        # block, b <= 32; a batch-blocked grid variant was prototyped as a
        # staging-row kernel and measured WORSE — 2.84 ms at b=128, XLA copies
        # the cache around the custom call — so it was not kept)
        if b <= 32 and dk.LAYER_GRID:
            t = measure_decode_steps([b], args.reps, args.rounds,
                                     allow_layer_grid=True)[str(b)]
            row["layer_grid_ms"] = round(t * 1e3, 3)
            row["grid_speedup_vs_split"] = round(split / t, 3)
        out[f"batch_{b}"] = row
        print(json.dumps({f"batch_{b}": row}), flush=True)
    print(json.dumps({"layer_grid_batch_ab": out}, indent=2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam-es-ab", action="store_true")
    ap.add_argument("--remat-ab", action="store_true")
    ap.add_argument("--layer-grid-batch-ab", action="store_true")
    ap.add_argument("--xla-arm", action="store_true",
                    help="also measure the pure-XLA decode step per batch")
    ap.add_argument("--ckpt", default="/tmp/retr_ab_ckpt/Concat_refcoco_checkpoint_0")
    ap.add_argument("--fixture-dir", default="/tmp/retr_e2e_fixture")
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 192, 256])
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--backbone", default="ResNet50")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--random", action="store_true",
                    help="beam-es-ab on random weights / unreachable EOS "
                    "(bench.py's full-127-step worst case)")
    ap.add_argument("--noise-sigma", type=float, default=0.0,
                    help="beam-es-ab: additive image noise (straggler mixture "
                    "— the case early stop exists for)")
    args = ap.parse_args()
    if args.beam_es_ab:
        beam_es_ab(args)
    if args.remat_ab:
        remat_ab(args)
    if args.layer_grid_batch_ab:
        layer_grid_batch_ab(args)


if __name__ == "__main__":
    main()
