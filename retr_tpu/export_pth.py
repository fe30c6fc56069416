"""Export CLI: retr_tpu checkpoint directory -> reference-format ``.pth``.

    python -m retr_tpu.export_pth --checkpoint data/models/refcoco/Concat_refcoco_checkpoint_7 \
        [--out model.pth]

The output loads in the reference's ``eval_model.py`` (``model_state_dict`` +
epoch/losses/CIDEr — train_utils/checkpoints.py:4-15) and round-trips bit-exactly
through ``import_reference_checkpoint`` (see models/torch_export.py for the
frozen-BN inverse). The default output name follows the reference's filename
template so its filename-sniffing config override keeps working
(eval_model.py:49-82).
"""

from __future__ import annotations

import argparse
import os

import jax

from retr_tpu.models import caption
from retr_tpu.train import checkpoints as ckpt
from retr_tpu.train.state import TrainState, make_optimizer


def main() -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="retr_tpu checkpoint dir")
    ap.add_argument("--out", default="", help="output .pth path (default: "
                    "<checkpoint-dir-name>.pth beside the checkpoint)")
    args = ap.parse_args()

    cfg = ckpt.config_from_checkpoint(args.checkpoint)
    meta = ckpt.read_metadata(args.checkpoint)
    template, _ = caption.build_model(cfg, jax.random.key(0))
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state, _ = ckpt.load_checkpoint(
        args.checkpoint, TrainState(template, tx.init(template), jax.numpy.int32(0))
    )
    out = args.out or os.path.normpath(args.checkpoint).rstrip("/") + ".pth"
    ckpt.export_reference_checkpoint(
        state.params, cfg, out,
        epoch=meta.get("epoch", 0),
        train_loss=meta.get("train_loss", float("nan")),
        val_loss=meta.get("val_loss", float("nan")),
        cider_score=meta.get("cider_score", float("nan")),
    )
    print(out)
    return out


def cli() -> None:
    """Console entry point: main() returns the .pth path for programmatic use,
    but the pip script wrapper calls ``sys.exit(cli())`` — returning that string
    would print it to stderr and exit 1."""
    main()


if __name__ == "__main__":
    cli()
