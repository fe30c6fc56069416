"""Evaluation CLI.

Reference: eval_model.py:103-146. Same surface:

    python -m retr_tpu.eval_model --split {val,testa,testb,test} --checkpoint PATH
        [--print_samples] [--store_results] [--override_config]
        [--decoder {greedy,beam,sample}] [--config path.json]

- retr_tpu checkpoints carry their config; ``--override_config`` loads it
  (replacing the reference's filename sniffing, eval_model.py:49-82).
- Reference ``.pth`` checkpoints are auto-detected and weight-imported, with the
  reference's filename-substring override applied for variant flags.
- ``--store_results`` writes generated expressions + metrics JSON under
  ``<project_data_path>/results/`` (eval_model.py:128-146).
- ``--decoder beam`` adds beam-search evaluation; ``--decoder sample``
  stochastic sampling (cfg sample_* knobs) — north-star extensions.
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from retr_tpu.config import Config
from retr_tpu.data import dataset as ds
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.engine import eval_model as run_eval
from retr_tpu.train import checkpoints as ckpt
from retr_tpu.train.state import TrainState, make_optimizer


def prepare_model(args, config: Config):
    """Load params for either a retr_tpu checkpoint dir or a reference .pth file."""
    assert args.checkpoint is not None, "checkpoint required"
    if args.checkpoint.endswith(".pth"):
        if args.override_config:
            config = ckpt.override_config_with_reference_filename(config, args.checkpoint)
        params, _ = ckpt.import_reference_checkpoint(args.checkpoint, config)
        return params, config
    if args.override_config:
        config = ckpt.config_from_checkpoint(args.checkpoint)
    from retr_tpu.models import caption

    template_params, _ = caption.build_model(config, jax.random.key(0))
    tx = make_optimizer(config, steps_per_epoch=1)
    template = TrainState(template_params, tx.init(template_params), jax.numpy.int32(0))
    state, _ = ckpt.load_checkpoint(args.checkpoint, template)
    return state.params, config


def setup_val_dataloader(config: Config, split: str, tokenizer, batch_size: int = 0):
    dataset = ds.build_dataset(config, split, tokenizer=tokenizer, return_unique=True)
    return ds.DataLoader(dataset, batch_size or config.batch_size,
                         num_workers=config.num_workers)


def main_val_set(args, config: Config):
    import dataclasses

    from retr_tpu.main import apply_device_config

    if getattr(args, "device", ""):
        config = dataclasses.replace(config, device=args.device)
    apply_device_config(config)
    params, config = prepare_model(args, config)
    if getattr(args, "device", ""):
        # --override_config may have swapped in the checkpoint's config; the CLI
        # device override still wins (matches reference precedence: the arg is
        # applied after config resolution, eval_model.py:111-126).
        config = dataclasses.replace(config, device=args.device)
    tokenizer, _, _ = prepare_tokenizer(config.vocab_file)
    loader = setup_val_dataloader(config, args.split, tokenizer,
                                  batch_size=getattr(args, "batch", 0))

    def run():
        return run_eval(
            params, config, loader, tokenizer,
            print_samples=args.print_samples, decoder=args.decoder,
        )

    if getattr(args, "profile_dir", ""):
        from retr_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            metrics, ids_hyps = run()
    else:
        metrics, ids_hyps = run()
    return metrics, ids_hyps


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", default="val", choices=["val", "testa", "testb", "test"])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default="", help="JSON config file")
    ap.add_argument("--print_samples", action="store_true")
    ap.add_argument("--store_results", action="store_true")
    ap.add_argument("--override_config", action="store_true",
                    help="take model-variant config from the checkpoint")
    ap.add_argument("--decoder", default="greedy",
                choices=["greedy", "beam", "sample"])
    ap.add_argument("--device", default="",
                    choices=["", "tpu", "cpu"],
                    help="override Config.device for this run (reference "
                    "eval_model.py:111-113 exposes the same knob as "
                    "--device cuda/cpu)")
    ap.add_argument("--profile_dir", default="",
                    help="write a jax.profiler device trace of the eval here "
                    "(view with TensorBoard/xprof)")
    ap.add_argument("--batch", type=int, default=0,
                    help="eval batch size override (0 = config.batch_size, the "
                    "reference behavior; decode tokens are batch-size-invariant "
                    "— tested — and batch 256 measured fastest, docs/PERF.md)")
    return ap


def cli(argv=None) -> None:
    """Console entry point (`retr-eval` / `python -m retr_tpu.eval_model`)."""
    args = build_argparser().parse_args(argv)
    config = Config.from_json(open(args.config).read()) if args.config else Config()
    metrics, ids_hypotheses = main_val_set(args, config)
    print(metrics)

    if args.store_results:
        outdir = os.path.join(config.project_data_path, "results")
        os.makedirs(outdir, exist_ok=True)
        base = os.path.basename(args.checkpoint.rstrip("/")).replace(".pth", "")
        with open(os.path.join(outdir, f"{base}_{args.split}_generated.json"), "w") as f:
            json.dump(ids_hypotheses, f)
        with open(os.path.join(outdir, f"{base}_{args.split}_metrics.json"), "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    cli()
