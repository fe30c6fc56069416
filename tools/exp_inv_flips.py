"""Quantify cross-batch-size greedy token divergence (random weights).

tools/exp_batch_scale.py reports first-32-row token invariance across batch
sizes. After the r4 true-bf16 decode loop (decode._cast_for_decode stores
memory/caches/weights in bf16), that check started failing on RANDOM weights.
This probe decides between the two explanations:

  (a) random-weight near-tie argmax flips: encode's conv/matmul tilings differ
      across batch sizes, the f32->bf16 rounding of the memory amplifies the
      difference, and argmax on ~N(0, eps) logit margins flips — benign, the
      same class as the r2 0.27% f32-vs-bf16 random-weight flips (trained
      margins absorb it: docs/AB_BF16.json measures 0 flips on the trained
      checkpoint).
  (b) a real cross-row bug in the batched decode path — disqualifying.

Evidence printed per flipped row: the first divergent step and the f32-HIGHEST
teacher-forced top1-top2 logit margin at that step (margins ~1e-3 and bimodal
agreement with both candidates => (a); margins O(1) or systematic => (b)).
Also runs the same comparison in f32 parity mode, where invariance must be
EXACT (a f32 failure is always a bug).

Reference scope: batched greedy semantics mirror eval_utils/decode.py:53-81.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMAGE, MAX_LEN = 224, 128


def run_mode(dtype_name: str, batches, base, inv_rows=32, ckpt=None):
    import jax
    import jax.numpy as jnp

    from retr_tpu import decode
    from retr_tpu.config import Config
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption

    if ckpt:
        from retr_tpu.train import checkpoints
        from retr_tpu.train.state import TrainState, make_optimizer

        cfg = checkpoints.config_from_checkpoint(ckpt).replace(
            compute_dtype=dtype_name, use_pallas_decode=True)
        params, _ = caption.build_model(cfg, jax.random.key(0))
        tx = make_optimizer(cfg, steps_per_epoch=1)
        state, _ = checkpoints.load_checkpoint(
            ckpt, TrainState(params, tx.init(params), jnp.int32(0)))
        params = state.params
    else:
        cfg = Config(backbone="ResNet50", dilation=True, dropout=0.1,
                     use_pallas_decode=True, compute_dtype=dtype_name)
        params, _ = caption.build_model(cfg, jax.random.key(0))
    kwargs = dict(max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
                  compute_dtype=jnp.dtype(cfg.compute_dtype))

    toks = {}
    for b in batches:
        img = jnp.asarray(base[:b])
        samples = Masked(img, jnp.zeros((b, IMAGE, IMAGE), dtype=bool))
        toks[b] = np.asarray(decode.greedy(params, cfg, samples, **kwargs))[:inv_rows]

    b0 = batches[0]
    out = {"mode": dtype_name, "base_batch": b0}
    for b in batches[1:]:
        a, c = toks[b0], toks[b]
        diff = a != c
        n_rows = int((diff.any(axis=1)).sum())
        n_pos = int(diff.sum())
        entry = {"rows_flipped": n_rows, "positions_flipped": n_pos,
                 "total_positions": int(diff.size)}
        if n_rows and dtype_name != "float32":
            # margin evidence at each row's first divergent step (f32 HIGHEST
            # teacher-forced logits on the base-batch tokens)
            margins = _margins_at_divergence(params, cfg, base, a, c, diff)
            entry["f32_top2_margin_at_divergence"] = margins
        out[f"vs_batch_{b}"] = entry
    return out


def _margins_at_divergence(params, cfg, base, a, c, diff):
    """f32-HIGHEST teacher-forced top1-top2 logit margin at each flipped row's
    first divergent step. Causal self-attention means the logits at step t-1
    depend only on tokens [0..t-1] — identical between the two decodes up to the
    divergence — so an all-real cap_mask gives the exact margins."""
    import jax.numpy as jnp

    from retr_tpu.masking import Masked
    from retr_tpu.models import caption

    rows = np.where(diff.any(axis=1))[0]
    b0 = a.shape[0]
    img = jnp.asarray(base[:b0])
    samples = Masked(img, jnp.zeros((b0, IMAGE, IMAGE), dtype=bool))
    caps = jnp.asarray(a.astype(np.int32))
    cap_mask = jnp.zeros(a.shape, dtype=bool)
    logits = np.asarray(caption.forward(
        params, cfg, samples, caps[:, :-1], cap_mask[:, :-1],
        train=False, compute_dtype=jnp.float32))
    margins = []
    for r in rows[:16]:
        t = int(np.argmax(diff[r]))  # first divergent emitted position
        step = max(t - 1, 0)         # logits[., step] produced token at t
        row = np.sort(logits[r, step].astype(np.float64))
        margins.append({"row": int(r), "step": int(t),
                        "margin": float(row[-1] - row[-2])})
    return margins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 128])
    ap.add_argument("--ckpt", default=None,
                    help="trained checkpoint dir (e.g. tools/ab_bf16.py's "
                    "/tmp/retr_ab_ckpt/Concat_refcoco_checkpoint_0); trained "
                    "margins are where the invariance claim lives")
    args = ap.parse_args()

    n = max(args.batches)
    if args.ckpt:
        base = _fixture_images(args.ckpt, n)
    else:
        rng = np.random.default_rng(0)
        base = rng.normal(size=(n, 3, IMAGE, IMAGE)).astype(np.float32)

    for mode in ("bfloat16", "float32"):
        print(json.dumps(run_mode(mode, args.batches, base, ckpt=args.ckpt)),
              flush=True)


def _fixture_images(ckpt: str, n: int) -> np.ndarray:
    """In-distribution inputs for the trained-margin claim: the checkpoint's own
    eval images (its config embeds the fixture paths), tiled up to n rows."""
    from retr_tpu.data import dataset as ds
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.train import checkpoints

    from retr_tpu.data.pipeline import device_batch

    cfg = checkpoints.config_from_checkpoint(ckpt)
    tok, _, _ = prepare_tokenizer()
    eval_set = ds.build_dataset(cfg, "val", tokenizer=tok, return_unique=True)
    chunks = []
    got = 0
    for host in ds.DataLoader(eval_set, batch_size=32, num_workers=2):
        chunks.append(np.asarray(device_batch(host).images, np.float32))
        got += chunks[-1].shape[0]
        if got >= n:
            break
    arr = np.concatenate(chunks)
    reps = -(-n // len(arr))
    return np.tile(arr, (reps, 1, 1, 1))[:n]


if __name__ == "__main__":
    main()
