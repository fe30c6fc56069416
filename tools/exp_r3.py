"""Round-3 perf experiments (run on the real chip; numbers land in docs/PERF.md).

Modes:
  --stage-ab   train epoch loop: staged (background-thread) vs inline uploads,
               interleaved reps so tunnel weather cancels.
  --beam-ab    beam-5 batch-32: fused head top-k kernel vs flat XLA tail,
               plus token-equality check between the two paths.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, IMAGE = 32, 224


def flagship(**kw):
    from retr_tpu.config import Config

    return Config(backbone="ResNet50", dilation=True, dropout=0.1,
                  use_pallas_decode=True, compute_dtype="bfloat16", **kw)


def stage_ab(reps: int = 3, n: int = 12):
    import jax
    import jax.numpy as jnp

    from retr_tpu import engine
    from retr_tpu.data.dataset import HostBatch
    from retr_tpu.models import caption
    from retr_tpu.train import state as tstate

    cfg = flagship()
    params, _ = caption.build_model(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    t_cap = cfg.max_position_embeddings + 1
    hb = HostBatch(
        ann_ids=np.arange(BATCH),
        target_images=rng.integers(0, 256, (BATCH, IMAGE, IMAGE, 3), dtype=np.uint8),
        target_masks=np.zeros((BATCH, IMAGE, IMAGE), bool),
        caps=np.asarray(rng.integers(1, cfg.vocab_size, (BATCH, t_cap)), np.int32),
        cap_masks=np.zeros((BATCH, t_cap), bool),
    )
    tx = tstate.make_optimizer(cfg, steps_per_epoch=1000)
    # donate=False: params are shared across fresh() states over many reps — a
    # donating step would free the original buffers after the first epoch.
    step_d = tstate.make_train_step(cfg, tx, donate=False)

    def fresh():
        return tstate.TrainState(params, tx.init(params), jnp.int32(0))

    s = fresh()
    s, _ = engine.train_one_epoch(s, step_d, [hb] * 3, jax.random.key(1))  # compile
    out = {"staged": [], "inline": []}
    for rep in range(reps):
        for mode, flag in (("staged", True), ("inline", False)):
            s = fresh()
            t0 = time.perf_counter()
            s, _ = engine.train_one_epoch(s, step_d, [hb] * n, jax.random.key(1),
                                          stage_uploads=flag)
            dt = (time.perf_counter() - t0) / n
            out[mode].append(dt)
            print(f"rep{rep} {mode}: {dt * 1e3:.1f} ms/step "
                  f"{BATCH / dt:.1f} samples/s", flush=True)
    for mode, dts in out.items():
        med = float(np.median(dts))
        print(f"MEDIAN {mode}: {med * 1e3:.1f} ms/step {BATCH / med:.1f} samples/s")


def beam_ab(reps: int = 3, k: int = 5):
    import jax
    import jax.numpy as jnp

    from retr_tpu import decode
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption
    from retr_tpu.ops import decoder_kernels as dk

    cfg = flagship()
    params, _ = caption.build_model(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(BATCH, 3, IMAGE, IMAGE)), jnp.float32)
    samples = Masked(img, jnp.zeros((BATCH, IMAGE, IMAGE), bool))
    kw = dict(max_len=128, bos_token=101, eos_token=cfg.vocab_size + 1,
              beam_size=k, compute_dtype=jnp.dtype(cfg.compute_dtype))

    results = {}
    toks = {}
    for mode, flag in (("fused_topk", True), ("flat_xla", False)):
        dk.BEAM_TOPK_KERNEL = flag
        decode.beam_search.clear_cache() if hasattr(decode.beam_search, "clear_cache") else None
        t, s = decode.beam_search(params, cfg, samples, **kw)
        toks[mode] = np.asarray(t)  # compile + warmup fetch
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [decode.beam_search(params, cfg, samples, **kw)[0] for _ in range(3)]
            for o in outs:
                np.asarray(o)
            dts.append((time.perf_counter() - t0) / 3)
        med = float(np.median(dts))
        results[mode] = med
        print(f"{mode}: {med * 1e3:.1f} ms/batch {BATCH / med:.1f} captions/s", flush=True)
    same = (toks["fused_topk"] == toks["flat_xla"]).all()
    n_diff = int((toks["fused_topk"] != toks["flat_xla"]).sum())
    print(f"token equality fused vs flat: {'EXACT' if same else f'{n_diff} tokens differ'}")
    print(f"speedup: {results['flat_xla'] / results['fused_topk']:.3f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage-ab", action="store_true")
    ap.add_argument("--beam-ab", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    if a.stage_ab:
        stage_ab(a.reps)
    if a.beam_ab:
        beam_ab(a.reps)
