"""Multi-dataset evaluation sweep CLI (BASELINE.md config 5).

Runs the dp-mesh-sharded greedy eval over every requested dataset/split combination:

    python -m retr_tpu.sweep_cli --checkpoint PATH \
        --datasets refcoco:val,testa,testb refcoco+:val,testa,testb refcocog:val,test \
        [--dp N] [--decoder {greedy,beam,sample}] [--config cfg.json]
        [--out sweep_results.json]

Each prefix's annotations are expected under <ref_base>/<prefix>; splits follow the
reference's partition names (testa/testb for refcoco/refcoco+, test for refcocog —
data_utils/refcoco.py:207-220). The reference can only do this one (dataset, split)
at a time on one device (eval_model.py); here one command covers the matrix with the
batch sharded over all chips.
"""

from __future__ import annotations

import argparse
import json

import jax

from retr_tpu.config import Config
from retr_tpu.data import dataset as ds
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.eval_model import prepare_model
from retr_tpu.parallel import mesh as pmesh
from retr_tpu.parallel.sweep import full_eval_sweep


def parse_datasets(specs):
    """['refcoco:val,testa'] -> [('refcoco', 'val'), ('refcoco', 'testa')]"""
    out = []
    for spec in specs:
        prefix, _, splits = spec.partition(":")
        for split in (splits or "val").split(","):
            out.append((prefix, split))
    return out


def main(args, config: Config):
    mp = max(1, args.mp)
    n_dev = len(jax.devices())
    if mp > n_dev or n_dev % mp:
        # validate BEFORE the (slow) checkpoint load; dp=0 would otherwise
        # surface later as a ZeroDivisionError in the batch padding
        raise ValueError(
            f"--mp {mp} must divide the device count ({n_dev}); otherwise dp "
            "would be 0 or devices silently dropped from the mesh"
        )

    params, config = prepare_model(args, config)
    tokenizer, _, _ = prepare_tokenizer(config.vocab_file)

    mesh = pmesh.make_mesh(dp=args.dp or n_dev // mp, mp=mp)
    if mp > 1:
        # tensor-parallel eval: shard heads/FFN/vocab-head over mp once here;
        # eval_model_sharded keeps pre-sharded params (parallel/sweep.py:77-78).
        params = pmesh.shard_params(params, mesh)

    batch = args.batch or config.batch_size
    loaders = {}
    for prefix, split in parse_datasets(args.datasets):
        cfg_d = config.replace(prefix=prefix, ref_dir="")  # ref_dir rederived from prefix
        dataset = ds.build_dataset(cfg_d, split, tokenizer=tokenizer, return_unique=True)
        loaders[f"{prefix}/{split}"] = ds.DataLoader(
            dataset, batch, num_workers=config.num_workers
        )

    store = getattr(args, "store_generations", "")
    out = full_eval_sweep(params, config, tokenizer, mesh, datasets=loaders,
                          decoder=args.decoder, return_hypotheses=bool(store))
    results, hyps = out if store else (out, None)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    if store:
        with open(store, "w") as f:
            json.dump(hyps, f, indent=2)
    return results


def build_argparser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default="")
    ap.add_argument("--datasets", nargs="+", default=["refcoco:val"],
                    help="prefix:split[,split...] per entry")
    ap.add_argument("--dp", type=int, default=0,
                    help="dp mesh size (default: all devices / mp)")
    ap.add_argument("--mp", type=int, default=1,
                    help="tensor-parallel mesh size (shards attention heads, the "
                    "FFN inner dim, and the vocab head — parallel/mesh.py specs)")
    ap.add_argument("--decoder", default="greedy",
                    choices=["greedy", "beam", "sample"])
    ap.add_argument("--batch", type=int, default=0,
                    help="eval batch size (default 0 = config.batch_size, the "
                    "reference semantics). Decode tokens are batch-size-invariant "
                    "(tested); on a v5e chip --batch 256 measured ~90%% more "
                    "captions/s than 32 (BENCH_DETAILS.json) — pass it explicitly "
                    "where the memory budget allows")
    ap.add_argument("--out", default="", help="write results JSON here")
    ap.add_argument("--store-generations", default="", metavar="PATH",
                    help="also write the generated expressions per dataset/split "
                    "as JSON (the sweep-wide analogue of eval_model "
                    "--store_results)")
    ap.add_argument("--override_config", action="store_true")
    return ap


def cli(argv=None) -> None:
    """Console entry point (`retr-sweep` / `python -m retr_tpu.sweep_cli`).

    Returns None: the pip script wrapper calls ``sys.exit(cli())``, and a
    non-None return (e.g. the results dict) would print to stderr and exit 1."""
    a = build_argparser().parse_args(argv)
    cfg = Config.from_json(open(a.config).read()) if a.config else Config()
    main(a, cfg)


if __name__ == "__main__":
    cli()
