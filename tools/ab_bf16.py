"""bf16 / backbone-precision A/B on a TRAINED checkpoint (VERDICT r1 item 4).

Round 1 measured bf16's 16% throughput win and backbone-HIGH's ~11% win but only
validated token stability on random weights (0.27% flips). Trained models have
far larger logit margins; this tool produces the trained-checkpoint evidence:

1. trains the flagship-shaped model (ResNet50 dilated, 6+6, d=256) to memorize a
   96-image synthetic RefCOCO fixture on the TPU (checkpoint cached across runs);
2. greedy-decodes the eval split under four precision configs —
   A: f32 HIGHEST (parity baseline)        B: backbone_precision='high'
   C: compute_dtype='bfloat16'             D: both
3. reports exact token-buffer flip rates vs A and the CIDEr/BLEU-4 deltas.

A config is promoted to the benchmark default only if token-neutral or
metric-neutral here (bench.py documents the chosen mode).

``--train-ab`` runs the TRAINING-precision A/B instead (VERDICT r2 item 5): two
complete memorization runs from the same init over the identical seeded batch
stream — one stepping in f32, one with compute_dtype=bfloat16 — then each
resulting checkpoint is greedy-evaluated at f32 HIGHEST. The artifact records
both loss curves, final CIDEr/BLEU-4, and how many greedy hypotheses the two
checkpoints share (the weights differ numerically, so equal-quality convergence,
not bit-equality, is the bar). Results merge into docs/AB_BF16.json under
"train_ab".

``--pth PATH`` runs the STANDING PROMOTION GATE on a real reference-format
checkpoint instead (VERDICT r4 item 8): imports the ``.pth`` weights
(variant flags sniffed from the reference's filename convention,
eval_model.py:49-82), greedy- and beam-decodes a fixture eval set under
f32 HIGHEST vs bfloat16, and EXITS NONZERO on any token flip — the same
zero-flip rule that promoted bf16 on the synthetic trained checkpoint
(docs/AB_BF16.json) must re-validate on every real checkpoint.
tools/real_assets_check.py invokes this automatically when a ``.pth`` appears.

Usage: python tools/ab_bf16.py [--steps 400] [--ckpt-dir /tmp/retr_ab_ckpt]
       python tools/ab_bf16.py --train-ab [--steps 400]
       python tools/ab_bf16.py --pth /path/to/reference_checkpoint.pth
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_e2e import make_fixture  # noqa: E402


def train_precision_ab(args, base, tok):
    """Twin training runs (identical init + seeded batch stream), stepping in f32
    vs bfloat16; each checkpoint then greedy-evaluated at f32 HIGHEST."""
    import time

    import jax
    import jax.numpy as jnp

    from retr_tpu import engine
    from retr_tpu.data import dataset as ds
    from retr_tpu.models import caption
    from retr_tpu.train.state import TrainState, make_optimizer, make_train_step

    eval_set = ds.build_dataset(base, "val", tokenizer=tok, return_unique=True)
    eval_loader = ds.DataLoader(eval_set, base.batch_size, num_workers=4)

    results, hyps = {}, {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        train_set = ds.build_dataset(base, "val", tokenizer=tok)
        loader = ds.DataLoader(train_set, base.batch_size, shuffle=True,
                               drop_last=True, num_workers=4)  # seed=0 both runs
        params, _ = caption.build_model(base, jax.random.key(0))  # shared init
        tx = make_optimizer(base, steps_per_epoch=len(loader))
        state = TrainState(params, tx.init(params), jnp.int32(0))
        step = make_train_step(base, tx, compute_dtype=dt, donate=False)
        curve, epoch = [], 0
        t0 = time.time()
        while int(state.step) < args.steps:
            state, loss = engine.train_one_epoch(state, step, loader,
                                                 jax.random.key(1), epoch=epoch)
            curve.append(round(loss, 4))
            print(f"[{name}] epoch {epoch}: step {int(state.step)} loss {loss:.4f}",
                  flush=True)
            epoch += 1
            if loss < 0.02:
                break
        wall = time.time() - t0
        m, ih = engine.eval_model(state.params, base, eval_loader, tok)
        hyps[name] = [h["expression"] for h in ih]
        results[name] = {
            "loss_curve": curve,
            "final_loss": curve[-1],
            "train_wall_s": round(wall, 1),
            "CIDEr": round(m["CIDEr"], 4),
            "Bleu_4": round(m["Bleu_4"], 4),
        }
        print(name, results[name], flush=True)

    same = sum(a == b for a, b in zip(hyps["f32"], hyps["bf16"]))
    results["identical_hypotheses"] = f"{same}/{len(hyps['f32'])}"
    results["note"] = ("different step arithmetic -> numerically different weights;"
                      " the bar is equal-quality convergence, not bit equality")
    print(json.dumps(results), flush=True)

    art = os.path.join(REPO, "docs", "AB_BF16.json")
    merged = {}
    if os.path.exists(art):
        with open(art) as f:
            merged = json.load(f)
    merged["train_ab"] = results
    with open(art, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"merged into {art}")
    return results


def pth_flip_gate(args) -> int:
    """Zero-flip bf16 promotion gate on a REAL reference ``.pth`` checkpoint.

    Decodes the synthetic fixture's eval images (real RefCOCO data is not
    required — the gate probes the WEIGHTS' argmax margins under bf16 memory
    rounding, docs/AB_BF16.json) with the imported weights under f32 HIGHEST vs
    compute_dtype=bfloat16. Greedy buffers must be token-exact and beam k=5 top
    hypotheses row-exact, matching the rule that promoted bf16 as the bench
    default. Returns 0 on pass; nonzero token flips return 1.
    """
    import jax.numpy as jnp

    from retr_tpu import decode as decode_mod
    from retr_tpu.config import Config
    from retr_tpu.data import dataset as ds
    from retr_tpu.data.pipeline import device_batch
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.masking import Masked
    from retr_tpu.train import checkpoints as ckpt

    coco_dir, ref_dir = make_fixture(args.fixture_dir, args.images)
    tok, syn_bos, syn_eos = prepare_tokenizer()  # captions unused by decode

    # Reference-default Config (ResNet101 dilated, d=256, vocab 30522) + the
    # filename-sniffed variant flags — must match the .pth's shapes to import.
    # --pth-config supplies an explicit Config JSON for non-default-shape
    # checkpoints (e.g. the gate's own selftest on an exported ResNet50 model).
    if getattr(args, "pth_config", ""):
        base_cfg = Config.from_json(open(args.pth_config).read())
    else:
        base_cfg = Config()
    cfg = base_cfg.replace(dir=coco_dir, ref_dir=ref_dir, verbose=False,
                           batch_size=args.batch, num_workers=4,
                           use_pallas_decode=True, compute_dtype="float32")
    cfg = ckpt.override_config_with_reference_filename(cfg, args.pth)
    params, _ = ckpt.import_reference_checkpoint(args.pth, cfg)
    cfg_bf16 = cfg.replace(compute_dtype="bfloat16")
    # Real checkpoints use the bert-base-uncased layout ([CLS]=101/[SEP]=102);
    # small-vocab selftest exports fall back to the fixture tokenizer's ids.
    bos_id, eos_id = (101, 102) if cfg.vocab_size >= 30522 else (syn_bos, syn_eos)

    eval_set = ds.build_dataset(cfg, "val", tokenizer=tok, return_unique=True)
    loader = ds.DataLoader(eval_set, cfg.batch_size, num_workers=4)

    greedy_flips = greedy_rows = beam_rows = 0
    n_tokens = n_rows = 0
    for host in loader:
        batch = device_batch(host, train=False)
        samples = Masked(batch.images, batch.image_masks)
        g = (Masked(batch.global_images, batch.global_masks)
             if batch.global_images is not None else None)
        bufs, beams = {}, {}
        for name, c in (("f32", cfg), ("bf16", cfg_bf16)):
            bufs[name] = np.asarray(decode_mod.greedy(
                params, c, samples, global_samples=g, loc_feats=batch.loc_feats,
                max_len=c.max_position_embeddings,
                bos_token=bos_id, eos_token=eos_id,
                compute_dtype=jnp.dtype(c.compute_dtype)))
            toks, _ = decode_mod.beam_search(
                params, c, samples, global_samples=g, loc_feats=batch.loc_feats,
                max_len=c.max_position_embeddings,
                bos_token=bos_id, eos_token=eos_id, beam_size=5,
                compute_dtype=jnp.dtype(c.compute_dtype))
            beams[name] = np.asarray(toks[:, 0])
        diff = bufs["f32"] != bufs["bf16"]
        greedy_flips += int(diff.sum())
        greedy_rows += int(diff.any(axis=1).sum())
        beam_rows += int((beams["f32"] != beams["bf16"]).any(axis=1).sum())
        n_tokens += bufs["f32"].size
        n_rows += bufs["f32"].shape[0]

    result = {
        "pth": args.pth,
        "greedy_token_flips": greedy_flips,
        "greedy_rows_changed": f"{greedy_rows}/{n_rows}",
        "beam5_rows_changed": f"{beam_rows}/{n_rows}",
        "tokens_compared": n_tokens,
        "pass": greedy_flips == 0 and beam_rows == 0,
    }
    print(json.dumps(result), flush=True)

    art = os.path.join(REPO, "docs", "AB_BF16.json")
    merged = {}
    if os.path.exists(art):
        with open(art) as f:
            merged = json.load(f)
    merged["real_pth_gate"] = result
    with open(art, "w") as f:
        json.dump(merged, f, indent=2)
    if not result["pass"]:
        print("bf16 promotion gate FAILED on real checkpoint — re-adjudicate "
              "compute_dtype default (docs/AB_BF16.json promotion rule)")
        return 1
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--fixture-dir", default="/tmp/retr_e2e_fixture")
    ap.add_argument("--ckpt-dir", default="/tmp/retr_ab_ckpt")
    ap.add_argument("--retrain", action="store_true")
    ap.add_argument("--variant", default="base", choices=["base", "glob_loc"],
                    help="glob_loc = CaptionGlobalLoc (dual-stream target+context"
                    "+location fusion, BASELINE config 4) — validates bf16 on the"
                    " fusion variant too")
    ap.add_argument("--train-ab", action="store_true",
                    help="twin f32-vs-bf16 TRAINING runs + f32 eval of each result")
    ap.add_argument("--pth", default="",
                    help="run the standing zero-flip bf16 gate on this real "
                    "reference .pth checkpoint instead of training")
    ap.add_argument("--pth-config", default="",
                    help="Config JSON matching the --pth checkpoint's shapes "
                    "(default: reference-default Config + filename sniffing)")
    args = ap.parse_args()

    if args.pth:
        sys.exit(pth_flip_gate(args))

    coco_dir, ref_dir = make_fixture(args.fixture_dir, args.images)

    import jax
    import jax.numpy as jnp

    from retr_tpu import decode as decode_mod
    from retr_tpu.config import Config
    from retr_tpu.data import dataset as ds
    from retr_tpu.data.pipeline import device_batch
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.engine import normalize_with_tokenizer, train_one_epoch
    from retr_tpu.masking import Masked
    from retr_tpu.metrics import NLGEval
    from retr_tpu.models import caption
    from retr_tpu.train import checkpoints as ckpt
    from retr_tpu.train.state import TrainState, make_optimizer, make_train_step

    tok, _, _ = prepare_tokenizer()
    variant_flags = (
        dict(use_global_features=True, use_location_features=True)
        if args.variant == "glob_loc" else {}
    )
    if args.variant != "base":
        args.ckpt_dir = args.ckpt_dir + "_" + args.variant
    base = Config(
        dir=coco_dir, ref_dir=ref_dir, verbose=False, backbone="ResNet50",
        dilation=True, dropout=0.1, batch_size=args.batch, num_workers=4,
        vocab_size=tok.vocab_size, use_pallas_decode=True, lr=1e-4,
        **variant_flags,
    )

    if args.train_ab:
        return train_precision_ab(args, base, tok)

    # ---- train (or load cached) ---------------------------------------------
    ckpt_path = os.path.join(args.ckpt_dir, ckpt.checkpoint_name(base, 0))
    if args.retrain or not os.path.isdir(ckpt_path):
        train_set = ds.build_dataset(base, "val", tokenizer=tok)  # fixture is all 'val'
        loader = ds.DataLoader(train_set, base.batch_size, shuffle=True,
                               drop_last=True, num_workers=4)
        params, _ = caption.build_model(base, jax.random.key(0))
        tx = make_optimizer(base, steps_per_epoch=len(loader))
        state = TrainState(params, tx.init(params), jnp.int32(0))
        # training itself runs bf16 DEFAULT precision for speed — the A/B below is
        # about EVAL precision on the resulting weights.
        step = make_train_step(base, tx, compute_dtype=jnp.bfloat16, donate=False)
        epoch, loss = 0, float("inf")
        while int(state.step) < args.steps:
            state, loss = train_one_epoch(state, step, loader, jax.random.key(1), epoch=epoch)
            print(f"epoch {epoch}: step {int(state.step)} loss {loss:.4f}", flush=True)
            epoch += 1
            if loss < 0.02:
                break
        ckpt.save_checkpoint(args.ckpt_dir, state, base, epoch=0, train_loss=loss)
        params = state.params
    else:
        params, _ = caption.build_model(base, jax.random.key(0))
        tx = make_optimizer(base, steps_per_epoch=1)
        template = TrainState(params, tx.init(params), jnp.int32(0))
        state, _ = ckpt.load_checkpoint(ckpt_path, template)
        params = state.params
        print("loaded cached checkpoint", flush=True)

    # ---- A/B eval -------------------------------------------------------------
    configs = {
        "A_f32_highest": base,
        "B_backbone_high": base.replace(backbone_precision="high"),
        "C_bf16": base.replace(compute_dtype="bfloat16"),
        "D_bf16_backbone_high": base.replace(compute_dtype="bfloat16",
                                             backbone_precision="high"),
    }

    eval_set = ds.build_dataset(base, "val", tokenizer=tok, return_unique=True)
    loader = ds.DataLoader(eval_set, base.batch_size, num_workers=4)
    pad_id, bos_id, eos_id = (tok.convert_tokens_to_ids(t) for t in
                              (tok.pad_token, tok.cls_token, tok.sep_token))

    annotations = {}
    for a in eval_set.annot:
        annotations.setdefault(a[0], []).append(a[2])

    buffers = {k: [] for k in configs}
    hyps = {k: [] for k in configs}
    refs = []
    for host in loader:
        batch = device_batch(host, train=False)
        samples = Masked(batch.images, batch.image_masks)
        g = (Masked(batch.global_images, batch.global_masks)
             if batch.global_images is not None else None)
        for name, cfg in configs.items():
            ids = np.asarray(decode_mod.greedy(
                params, cfg, samples, global_samples=g, loc_feats=batch.loc_feats,
                max_len=cfg.max_position_embeddings,
                bos_token=bos_id, eos_token=eos_id,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
            ))
            buffers[name].append(ids)
            pruned = decode_mod.prune_token_ids(
                ids.tolist(), clean=True, pad_token=pad_id,
                bos_token=bos_id, eos_token=eos_id)
            hyps[name] += tok.batch_decode(pruned)
        refs += [[normalize_with_tokenizer(r, tok) for r in annotations[int(i)]]
                 for i in host.ann_ids]

    # --- beam A/B (f32 vs bf16): beam is a north-star extension with no reference
    # parity constraint, but promoting bf16 there still wants trained evidence.
    beam_hyps = {}
    for name in ("A_f32_highest", "C_bf16"):
        cfg = configs[name]
        beam_hyps[name] = []
        for host in loader:
            batch = device_batch(host, train=False)
            samples = Masked(batch.images, batch.image_masks)
            g = (Masked(batch.global_images, batch.global_masks)
                 if batch.global_images is not None else None)
            toks, _ = decode_mod.beam_search(
                params, cfg, samples, global_samples=g, loc_feats=batch.loc_feats,
                max_len=cfg.max_position_embeddings,
                bos_token=bos_id, eos_token=eos_id, beam_size=5,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
            )
            pruned = decode_mod.prune_token_ids(
                np.asarray(toks[:, 0]).tolist(), clean=True, pad_token=pad_id,
                bos_token=bos_id, eos_token=eos_id)
            beam_hyps[name] += tok.batch_decode(pruned)
    beam_flips = sum(a != b for a, b in zip(beam_hyps["A_f32_highest"], beam_hyps["C_bf16"]))
    print(f"beam k=5 f32-vs-bf16: {beam_flips}/{len(beam_hyps['A_f32_highest'])} "
          f"hypotheses differ", flush=True)

    transposed = list(map(list, zip(*refs)))
    nlg = NLGEval()
    out = {}
    ref_buf = np.concatenate(buffers["A_f32_highest"])
    for name in configs:
        buf = np.concatenate(buffers[name])
        flips = int((buf != ref_buf).sum())
        rows = int((buf != ref_buf).any(axis=1).sum())
        m = nlg.compute_metrics(ref_list=transposed, hyp_list=hyps[name])
        out[name] = {
            "token_flips": flips,
            "flip_rate": round(flips / ref_buf.size, 6),
            "rows_changed": rows,
            "CIDEr": round(m["CIDEr"], 4),
            "Bleu_4": round(m["Bleu_4"], 4),
        }
        print(name, out[name], flush=True)
    out["beam5_f32_vs_bf16_hyp_flips"] = int(beam_flips)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
