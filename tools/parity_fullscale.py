"""Full-scale greedy-token parity artifact — the north star at the REFERENCE's size.

Earlier parity evidence was toy-scale only (tests/test_caption.py tiny_cfg). This
tool proves exact greedy-token equality at the reference's actual default
configuration (/root/reference/configuration_template.py:20-51):

    ResNet101 + dilated layer4, hidden 256, 8 heads, 6 enc + 6 dec, ff 2048,
    vocab 30522 (bert-base-uncased), 224x224 input, 128-position buffer.

Protocol (all CPU, f32 HIGHEST — the parity configuration):
1. torch.manual_seed -> full-scale torch oracle (tests/torch_oracle.CaptionModel,
   reference semantics audited in docs/ORACLE.md), saved as a reference-format
   ``.pth`` and imported through the PRODUCTION path
   (train/checkpoints.import_reference_checkpoint) — so the artifact also
   certifies the importer at full scale.
2. Teacher-forced full forward on random tokens: report logits max-abs-diff over
   [B, 128, 30522].
3. Greedy decode, reference loop semantics (eval_utils/decode.py:53-81): the
   oracle reruns the FULL model per step (capped at --steps, each step is a whole
   ResNet101+6+6 forward on one CPU core); retr_tpu runs its KV-cached jit loop
   over the full 128 buffer. The first steps+1 positions must match EXACTLY —
   autoregressive decoding means later steps cannot affect them.

Writes PARITY_FULLSCALE.json at the repo root; exit 0 iff token parity is exact.

    python tools/parity_fullscale.py [--batch 4] [--steps 20] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_LEN = 128
IMAGE = 224
BOS, EOS = 101, 102  # bert-base-uncased [CLS]/[SEP] (eval_utils/decode.py:6-10)


def run_parity(batch: int = 4, steps: int = 20, seed: int = 0,
               out: "str | None" = None) -> dict:
    """Run the full protocol; returns the artifact dict (and writes it to `out`)."""
    import types

    args = types.SimpleNamespace(batch=batch, steps=steps, seed=seed, out=out)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from retr_tpu import decode
    from retr_tpu.config import Config
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption
    from retr_tpu.train.checkpoints import import_reference_checkpoint
    from tests import torch_oracle

    cfg = Config()  # defaults == reference defaults (pinned by tests/test_utils.py)
    assert (cfg.backbone, cfg.dilation, cfg.hidden_dim, cfg.nheads, cfg.enc_layers,
            cfg.dec_layers, cfg.dim_feedforward, cfg.vocab_size,
            cfg.max_position_embeddings) == \
        ("ResNet101", True, 256, 8, 6, 6, 2048, 30522, MAX_LEN)
    cfg = cfg.replace(dropout=0.0)  # inference; dropout is off in eval either way

    print(f"[1/4] building full-scale torch oracle (seed={args.seed}) ...", flush=True)
    t0 = time.time()
    torch.manual_seed(args.seed)
    tm = torch_oracle.CaptionModel(
        backbone_name=cfg.backbone, dilation=cfg.dilation, vocab=cfg.vocab_size,
        d=cfg.hidden_dim, h=cfg.nheads, nenc=cfg.enc_layers, ndec=cfg.dec_layers,
        dff=cfg.dim_feedforward, max_pos=cfg.max_position_embeddings,
    ).eval()
    # non-trivial BN buffers so the frozen-BN fold is exercised at full depth
    from tests.test_resnet import randomize_bn_stats

    randomize_bn_stats(tm.backbone.body, seed=args.seed)

    with tempfile.TemporaryDirectory() as d:
        pth = os.path.join(d, "Concat_refcoco_checkpoint_0.pth")
        torch.save({"model_state_dict": tm.state_dict(), "epoch": 0}, pth)
        params, _ = import_reference_checkpoint(pth, cfg)
    print(f"      oracle + production import done in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(args.seed)
    img = rng.normal(size=(args.batch, 3, IMAGE, IMAGE)).astype(np.float32)
    mask = np.zeros((args.batch, IMAGE, IMAGE), bool)
    mask[0, IMAGE - IMAGE // 4:, :] = True  # square-pad-style padded strip on sample 0

    # --- teacher-forced logits bound -------------------------------------------
    print("[2/4] teacher-forced logits (torch) ...", flush=True)
    t0 = time.time()
    caps = rng.integers(0, cfg.vocab_size, size=(args.batch, MAX_LEN))
    cap_mask = np.zeros((args.batch, MAX_LEN), bool)
    cap_mask[:, 100:] = True
    with torch.no_grad():
        ref_logits = tm(torch.from_numpy(img), torch.from_numpy(mask),
                        torch.from_numpy(caps), torch.from_numpy(cap_mask)).numpy()
    t_torch_fwd = time.time() - t0
    print(f"      torch forward {t_torch_fwd:.1f}s; retr_tpu forward ...", flush=True)
    t0 = time.time()
    got_logits = np.asarray(caption.forward(
        params, cfg,
        Masked(jnp.asarray(img), jnp.asarray(mask)),
        jnp.asarray(caps), jnp.asarray(cap_mask),
    ))
    logit_diff = float(np.abs(got_logits - ref_logits).max())
    ref_scale = float(np.abs(ref_logits).max())
    del got_logits, ref_logits
    print(f"      retr_tpu forward {time.time() - t0:.1f}s; "
          f"logits max-abs-diff {logit_diff:.3e} (ref scale {ref_scale:.1f})", flush=True)

    # --- greedy token parity ----------------------------------------------------
    print(f"[3/4] oracle greedy, {args.steps} full-model steps ...", flush=True)
    t0 = time.time()
    want = torch_oracle.greedy_oracle(
        tm, (torch.from_numpy(img), torch.from_numpy(mask)),
        MAX_LEN, BOS, EOS, steps=args.steps,
    ).numpy()
    t_oracle = time.time() - t0
    print(f"      oracle decode {t_oracle:.1f}s; retr_tpu KV-cached greedy ...", flush=True)
    t0 = time.time()
    got = np.asarray(decode.greedy(
        params, cfg, Masked(jnp.asarray(img), jnp.asarray(mask)),
        max_len=MAX_LEN, bos_token=BOS, eos_token=EOS,
    ))
    t_retr = time.time() - t0
    print(f"      retr_tpu decode (all 127 steps) {t_retr:.1f}s", flush=True)

    n_cmp = args.steps + 1  # position 0 is BOS; steps 0..steps-1 write 1..steps
    a, b = want[:, :n_cmp], got[:, :n_cmp]
    n_bad = int((a != b).sum())
    total = int(a.size)

    print(f"[4/4] token parity over first {n_cmp} positions x {args.batch} rows: "
          f"{'EXACT' if n_bad == 0 else f'{n_bad}/{total} mismatches'}", flush=True)
    if n_bad:
        for i, j in np.argwhere(a != b)[:10]:
            print(f"  row {i} pos {j}: oracle={a[i, j]} retr={b[i, j]}")

    artifact = {
        "config": {
            "backbone": cfg.backbone, "dilation": cfg.dilation,
            "hidden_dim": cfg.hidden_dim, "nheads": cfg.nheads,
            "enc_layers": cfg.enc_layers, "dec_layers": cfg.dec_layers,
            "dim_feedforward": cfg.dim_feedforward, "vocab_size": cfg.vocab_size,
            "max_position_embeddings": cfg.max_position_embeddings,
            "image_size": IMAGE,
        },
        "batch": args.batch,
        "decode_steps_compared": args.steps,
        "positions_compared": n_cmp,
        "token_mismatches": n_bad,
        "tokens_compared": total,
        "teacher_forced_logit_max_abs_diff": logit_diff,
        "teacher_forced_logit_ref_scale": ref_scale,
        "seed": args.seed,
        "platform": "cpu f32 HIGHEST (both sides)",
        "oracle_decode_s": round(t_oracle, 1),
        "retr_decode_s": round(t_retr, 1),
        "torch_full_forward_s": round(t_torch_fwd, 1),
        "weights": "shared random init via reference-format .pth -> "
                   "train/checkpoints.import_reference_checkpoint (production path)",
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {args.out}")
    return artifact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20,
                    help="oracle decode steps (each is a full-model CPU forward)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_FULLSCALE.json"))
    args = ap.parse_args()
    artifact = run_parity(args.batch, args.steps, args.seed, args.out)
    sys.exit(0 if artifact["token_mismatches"] == 0 else 1)


if __name__ == "__main__":
    main()
