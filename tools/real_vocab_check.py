"""Real bert-base-uncased vocab validation (runs fully when the file exists).

The reference tokenizes with the pretrained HF BertTokenizer
(/root/reference/data_utils/refcoco.py:93-95, eval_utils/decode.py:6-10). retr_tpu's
from-scratch WordPiece is HF-algorithm-parity-fuzzed, but this image has no network
egress and no cached ``vocab.txt``, so default runs fall back to a synthetic vocab.
This tool closes the gap the moment the real file is available:

1. sanity: 30,522 entries with the BERT special ids ([PAD]=0, [UNK]=100,
   [CLS]=101, [SEP]=102, [MASK]=103);
2. tokenizer parity vs transformers.BertTokenizer ON THE REAL VOCAB — a fixed
   corpus of referring-expression-style strings plus seeded random ASCII fuzzing,
   exact token/id equality for tokenize() and encode();
3. one end-to-end eval_model run on the synthetic RefCOCO fixture with
   Config(vocab_size=30522, vocab_file=<real file>) — the full pipeline at the
   real vocabulary size.

Vocab discovery order: --vocab PATH, $RETR_BERT_VOCAB, data/bert-base-uncased-
vocab.txt under the repo root, any vocab.txt with 30,522 lines in the HF cache.
Without a file it prints SKIP and exits 0 (same gate as the companion test
tests/test_data.py::test_real_vocab_tokenizer_parity).

    python tools/real_vocab_check.py [--vocab PATH] [--fuzz 200]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFEXP_CORPUS = [
    "the woman in the red coat",
    "guy on the left wearing a blue shirt",
    "second zebra from the right",
    "a small dog sitting next to the chair",
    "person holding an umbrella behind the table",
    "the half-eaten sandwich closest to us",
    "bottom right corner pizza slice",
    "man's reflection in the mirror",
    "the car that isn't parked (moving)",
    "woman w/ glasses, 2nd row",
    "el hombre con sombrero",  # non-English falls through the same wordpiece path
    "THE BIG RED BUS!!",
]


def find_vocab(explicit: str = "") -> str:
    cands = [explicit, os.environ.get("RETR_BERT_VOCAB", ""),
             os.path.join(REPO, "data", "bert-base-uncased-vocab.txt")]
    for c in cands:
        if c and os.path.isfile(c):
            return c
    for pat in ("~/.cache/huggingface/**/vocab.txt", "~/.cache/torch/**/vocab.txt"):
        for p in glob.glob(os.path.expanduser(pat), recursive=True):
            try:
                with open(p, encoding="utf-8") as f:
                    if sum(1 for _ in f) == 30522:
                        return p
            except OSError:
                continue
    return ""


def check_tokenizer_parity(vocab_path: str, n_fuzz: int) -> int:
    import numpy as np
    from transformers import BertTokenizer

    from retr_tpu.data.tokenizer import WordPieceTokenizer

    ours = WordPieceTokenizer.from_vocab_file(vocab_path)
    hf = BertTokenizer(vocab_path, do_lower_case=True)

    assert ours.vocab_size == 30522, ours.vocab_size
    for tok, want in [("[PAD]", 0), ("[UNK]", 100), ("[CLS]", 101),
                      ("[SEP]", 102), ("[MASK]", 103)]:
        got = ours.convert_tokens_to_ids([tok])[0]
        assert got == want, (tok, got, want)

    rng = np.random.default_rng(0)
    alphabet = list("abcdefghijklmnopqrstuvwxyz  -'.,!?0123456789")
    fuzz = ["".join(rng.choice(alphabet, size=rng.integers(1, 40)))
            for _ in range(n_fuzz)]
    bad = 0
    for text in REFEXP_CORPUS + fuzz:
        a, b = ours.tokenize(text), hf.tokenize(text)
        ea, eb = ours.encode(text), hf.encode(text)
        if a != b or ea != eb:
            bad += 1
            if bad <= 5:
                print(f"MISMATCH {text!r}:\n  ours={a} {ea}\n  hf  ={b} {eb}")
    print(f"tokenizer parity on real vocab: "
          f"{len(REFEXP_CORPUS) + len(fuzz) - bad}/{len(REFEXP_CORPUS) + len(fuzz)} "
          f"strings exact")
    return bad


def run_end_to_end(vocab_path: str) -> dict:
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")

    from retr_tpu import engine
    from retr_tpu.config import Config
    from retr_tpu.data import dataset as ds
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.models import caption
    from tests.synth_refcoco import make_synth_refcoco

    with tempfile.TemporaryDirectory() as root:
        coco_dir, ref_dir = make_synth_refcoco(root, n_images=4)
        tok, _, _ = prepare_tokenizer(vocab_path)
        cfg = Config(
            dir=coco_dir, ref_dir=ref_dir, verbose=False,
            backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=128,
            vocab_size=tok.vocab_size, vocab_file=vocab_path,
            max_position_embeddings=16, dropout=0.0, image_size=64, batch_size=4,
        )
        assert cfg.vocab_size == 30522
        params, _ = caption.build_model(cfg, jax.random.key(0))
        dataset = ds.build_dataset(cfg, "training", tokenizer=tok, return_unique=True)
        loader = ds.DataLoader(dataset, cfg.batch_size, num_workers=2)
        metrics, hyps = engine.eval_model(params, cfg, loader, tok)
        assert all(v == v for v in metrics.values()), metrics  # finite
        print(f"end-to-end eval at vocab 30522: {len(hyps)} hyps, "
              f"CIDEr={metrics['CIDEr']:.3f} OK")
        return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", default="", help="path to bert-base-uncased vocab.txt")
    ap.add_argument("--fuzz", type=int, default=200)
    ap.add_argument("--out", default="", help="optional artifact JSON path")
    args = ap.parse_args()

    path = find_vocab(args.vocab)
    if not path:
        print("SKIP: bert-base-uncased vocab.txt not found — pass --vocab, set "
              "$RETR_BERT_VOCAB, or place it at data/bert-base-uncased-vocab.txt")
        sys.exit(0)

    print(f"real vocab: {path}")
    bad = check_tokenizer_parity(path, args.fuzz)
    metrics = run_end_to_end(path)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"vocab": path, "tokenizer_mismatches": bad,
                       "eval_metrics": metrics}, f, indent=2)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
