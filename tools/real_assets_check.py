"""One-command real-asset gate: run EVERY real-data validation the moment real
assets appear (VERDICT r3 item 7; closes the docs/ORACLE.md D4 caveat on contact
with reality).

All repo parity artifacts are necessarily produced under shared RANDOM weights
and SYNTHETIC fixtures — this image has no network egress, so the reference's
runtime downloads (torchvision ImageNet weights, models/backbone.py:87-88) and
its on-disk RefCOCO data (data_utils/utils.py:67-118) are absent. This tool
discovers whichever real assets exist and runs the corresponding gates:

  vocab   real bert-base-uncased vocab.txt
          -> tools/real_vocab_check.py (sanity + HF tokenizer parity fuzz +
             end-to-end eval at vocab 30522)
  pth     a reference-format .pth checkpoint (trained RE:TR weights)
          -> tools/parity_check.py --checkpoint PTH [--exact]: CPU-vs-TPU and
             XLA-vs-Pallas greedy token parity on the REAL weights
  refcoco a real RefCOCO annotation root (instances.json + refs(unc|umd).p)
          -> annotation loader smoke: load, split sizes, sentence integrity;
          -> with images + vocab also present: a real eval_model run over a
             bounded sample of val (CIDEr/BLEU on real references).

Discovery order per asset: CLI flag, env var, conventional repo paths.
Assets not found print SKIP (exit 0 — the gate is self-arming, not failing);
any gate that RUNS and fails exits nonzero.

    python tools/real_assets_check.py [--vocab V] [--pth P] [--refcoco-root R]
                                      [--coco-imgs DIR] [--exact] [--limit 64]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PY = sys.executable


def find_vocab(explicit: str) -> str:
    if explicit:
        return explicit
    if os.environ.get("RETR_BERT_VOCAB"):
        return os.environ["RETR_BERT_VOCAB"]
    cand = os.path.join(REPO, "data", "bert-base-uncased-vocab.txt")
    if os.path.exists(cand):
        return cand
    for path in glob.glob(os.path.expanduser("~/.cache/huggingface/**/vocab.txt"),
                          recursive=True):
        try:
            with open(path, encoding="utf-8") as f:
                if sum(1 for _ in f) == 30522:
                    return path
        except OSError:
            continue
    return ""


def find_pth(explicit: str) -> str:
    if explicit:
        return explicit
    if os.environ.get("RETR_REFERENCE_PTH"):
        return os.environ["RETR_REFERENCE_PTH"]
    for pat in ("data/*.pth", "checkpoints/*.pth", "data/checkpoints/*.pth"):
        hits = sorted(glob.glob(os.path.join(REPO, pat)))
        if hits:
            return hits[0]
    return ""


def find_refcoco(explicit: str) -> str:
    if explicit:
        return explicit
    if os.environ.get("RETR_REFCOCO_ROOT"):
        return os.environ["RETR_REFCOCO_ROOT"]
    for cand in (os.path.join(REPO, "data", "refcoco"),
                 os.path.join(REPO, "data", "ref", "refcoco"),
                 "/data/refcoco"):
        if os.path.exists(os.path.join(cand, "instances.json")):
            return cand
    return ""


def gate_vocab(vocab: str) -> int:
    print(f"== vocab gate: {vocab}")
    return subprocess.run(
        [PY, os.path.join(REPO, "tools", "real_vocab_check.py"), "--vocab", vocab]
    ).returncode


def gate_pth(pth: str, exact: bool) -> int:
    print(f"== reference-.pth parity gate: {pth}")
    cmd = [PY, os.path.join(REPO, "tools", "parity_check.py"), "--checkpoint", pth,
           "--pallas"]
    rc = subprocess.run(cmd).returncode
    if rc:
        return rc
    cmd = [PY, os.path.join(REPO, "tools", "parity_check.py"), "--checkpoint", pth]
    if exact:
        cmd.append("--exact")
    rc = subprocess.run(cmd).returncode
    if rc:
        return rc
    # Standing bf16-promotion gate (VERDICT r4 item 8): the zero-flip rule that
    # promoted compute_dtype=bfloat16 on a synthetic trained checkpoint
    # (docs/AB_BF16.json) must re-validate on every REAL checkpoint. Any greedy
    # token flip or beam top-hypothesis change under bf16 fails the gate.
    print(f"== bf16 zero-flip promotion gate: {pth}")
    return subprocess.run(
        [PY, os.path.join(REPO, "tools", "ab_bf16.py"), "--pth", pth]
    ).returncode


def gate_refcoco(root: str, vocab: str, pth: str, coco_imgs: str, limit: int) -> int:
    print(f"== RefCOCO annotation gate: {root}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from retr_tpu.data import annotations

    rows, ids = annotations.get_refcoco_data(root)
    n = {k: len(v) for k, v in ids["caption_ids"].items()}
    ok = (len(rows) > 0 and all(s in n for s in ("train", "val"))
          and all(v > 0 for v in n.values())
          and all(r.get("caption") or r.get("sent") for r in rows[:100]))
    print(json.dumps({"annotations": len(rows), "split_sizes": n, "ok": ok}))
    if not ok:
        return 1

    if not (vocab and coco_imgs and os.path.isdir(coco_imgs)):
        print("refcoco eval leg SKIP: needs --coco-imgs (train2014 dir) and a real vocab")
        return 0

    # Real end-to-end eval over a bounded val sample: random-weight model unless
    # a reference .pth is present (then its imported weights score for real).
    from retr_tpu import engine
    from retr_tpu.config import Config
    from retr_tpu.data import dataset as ds
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.models import caption
    from retr_tpu.train import checkpoints as ckpt

    cfg = Config(dir=coco_imgs, ref_dir=root,
                 prefix=os.path.basename(root.rstrip("/")),
                 vocab_file=vocab, vocab_size=30522, limit=limit)
    if pth:
        cfg = ckpt.override_config_with_reference_filename(cfg, pth)
        params, _ = ckpt.import_reference_checkpoint(pth, cfg)
    else:
        params, _ = caption.build_model(cfg, jax.random.key(0))
        print("note: random weights — metric VALUES are meaningless, the gate "
              "checks the pipeline end-to-end on real data")
    tokenizer, _, _ = prepare_tokenizer(cfg.vocab_file)
    dataset = ds.build_dataset(cfg, "validation", tokenizer=tokenizer,
                               return_unique=True)
    loader = ds.DataLoader(dataset, max(1, min(cfg.batch_size, 16)), num_workers=2)
    metrics, _ = engine.eval_model(params, cfg, loader, tokenizer)
    print(json.dumps({"real_eval_metrics": {k: round(float(v), 4)
                                            for k, v in metrics.items()}}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", default="")
    ap.add_argument("--pth", default="")
    ap.add_argument("--refcoco-root", default="")
    ap.add_argument("--coco-imgs", default="",
                    help="COCO train2014 image directory for the real eval leg")
    ap.add_argument("--exact", action="store_true",
                    help="require zero cross-hardware token flips (trained weights)")
    ap.add_argument("--limit", type=int, default=64,
                    help="val annotations for the bounded real eval leg")
    args = ap.parse_args()

    vocab = find_vocab(args.vocab)
    pth = find_pth(args.pth)
    refcoco = find_refcoco(args.refcoco_root)

    ran, failed = [], []
    for name, found, fn in (
        ("vocab", vocab, lambda: gate_vocab(vocab)),
        ("pth", pth, lambda: gate_pth(pth, args.exact)),
        ("refcoco", refcoco,
         lambda: gate_refcoco(refcoco, vocab, pth, args.coco_imgs, args.limit)),
    ):
        if not found:
            print(f"{name}: SKIP (asset not found)")
            continue
        ran.append(name)
        if fn():
            failed.append(name)

    print(json.dumps({"ran": ran, "failed": failed,
                      "skipped": [n for n in ("vocab", "pth", "refcoco")
                                  if n not in ran]}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
