"""Training entry point.

Reference: main.py:15-108. Epoch loop: train -> validation loss -> CIDEr eval ->
checkpoint -> early stop when CIDEr drops below the min of the last 5 scores
(main.py:96-99, including the scores-list-starts-at-[0] semantics). Additions over
the reference: working resume (--resume restores the latest checkpoint; the
reference's start_epoch is dead code), JSONL metric logging, and everything compiled.

Run:  python -m retr_tpu.main [--config path.json] [--resume]
"""

from __future__ import annotations

import argparse
import os

import jax

from retr_tpu import device
from retr_tpu.config import Config
from retr_tpu.data import dataset as ds
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.engine import eval_model, evaluate, train_one_epoch
from retr_tpu.models import caption
from retr_tpu.train import checkpoints as ckpt
from retr_tpu.train.state import TrainState, make_eval_step, make_optimizer, make_train_step
from retr_tpu.utils.logging import MetricLogger


def apply_device_config(config: Config) -> None:
    """Honor config.device ('tpu'/'cpu' — replaces the reference's 'cuda'/'cpu' knob,
    configuration_template.py:25). The axon plugin overrides JAX_PLATFORMS, so the
    explicit config update is required for CPU runs."""
    if config.device == "cpu":
        jax.config.update("jax_platforms", "cpu")


def validate_multihost_launch(config: Config, process_count: int, n_devices: int,
                              *, has_mesh: bool) -> None:
    """Refuse silently-wrong multi-process launches (docs/MULTIHOST.md).

    Pure function of the launch shape so the rules are unit-testable without a
    real multi-process slice (tests/test_main_cli.py); ``main()`` calls it with
    the live ``jax.process_count()`` / ``jax.devices()`` values."""
    if process_count <= 1:
        return
    # Without a mesh spanning every global device, each process would train an
    # independent model on its own data shard with no gradient sync and race on
    # checkpoint_path — silently wrong.
    if not has_mesh or config.dp_size * config.mp_size != n_devices:
        raise ValueError(
            "multi-host launch requires dp_size * mp_size == global device "
            f"count (got {config.dp_size} x {config.mp_size} over "
            f"{n_devices} devices); set Config.dp_size/mp_size for the whole slice"
        )
    # Sharded (host-specific) train batches must dp-split evenly: the ragged
    # fallback replicates, which is only value-correct for IDENTICAL per-host
    # data (eval loaders) — replicating host-specific rows would silently skip
    # the gradient all-reduce.
    if (config.batch_size * process_count) % config.dp_size:
        raise ValueError(
            f"batch_size * process_count ({config.batch_size} * "
            f"{process_count}) must divide over dp_size "
            f"({config.dp_size}) for multi-host training"
        )


def main(config: Config, resume: bool = False, init_pth: str = "") -> None:
    apply_device_config(config)
    # Multi-host runs share checkpoint_path (docs/MULTIHOST.md); give every
    # non-zero process its own metrics file so events aren't duplicated
    # process_count times into one metrics.jsonl with non-atomic interleaving
    # on network filesystems. Process 0 keeps the plain name for tooling.
    log_name = ("metrics.jsonl" if jax.process_index() == 0
                else f"metrics.p{jax.process_index()}.jsonl")
    logger = MetricLogger(os.path.join(config.checkpoint_path, log_name))
    key = jax.random.key(config.seed)

    if init_pth:
        # fine-tune from a reference-format .pth (two-way interop:
        # train/checkpoints.import_reference_checkpoint; the reference itself
        # cannot resume or fine-tune — its start_epoch is dead code).
        # Commit placement like build_model does for fresh inits, so every
        # later program hits the jit cache (retr_tpu/device.py).
        params, _ = ckpt.import_reference_checkpoint(init_pth, config)
        params = device.commit_to_local_device(params)
        logger.log("init_from_pth", path=init_pth)
    else:
        params, _ = caption.build_model(config, key)  # commits placement itself
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.log("init", n_parameters=int(n_params), config=config.to_dict())

    # multi-chip: cfg.dp_size x cfg.mp_size mesh — params sharded once here, every
    # batch dp-sharded in the epoch loops, CIDEr eval through the sharded sweep.
    # The reference is strictly single-device (SURVEY.md §2.2).
    mesh = None
    if config.dp_size * config.mp_size > 1:
        from retr_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(dp=config.dp_size, mp=config.mp_size)
        params = pmesh.shard_params(params, mesh)
        logger.log("mesh", dp=config.dp_size, mp=config.mp_size,
                   devices=len(jax.devices()))
    # single-device placement is already committed above (build_model /
    # the init_pth branch); only the mesh path re-places params.
    validate_multihost_launch(config, jax.process_count(), len(jax.devices()),
                              has_mesh=mesh is not None)

    tokenizer, _, _ = prepare_tokenizer(config.vocab_file)

    dataset_train = ds.build_dataset(config, "training", tokenizer=tokenizer)
    dataset_val = ds.build_dataset(config, "validation", tokenizer=tokenizer)
    dataset_cider = ds.build_dataset(config, "validation", tokenizer=tokenizer, return_unique=True)
    logger.log("datasets", train=len(dataset_train), val=len(dataset_val), cider=len(dataset_cider))

    # multi-host: each process loads its own slice of the training data (global
    # batch = process_count * batch_size; engine._shard_batch_on assembles the
    # global array via mesh.global_batch_from_local). Eval loaders stay full per
    # host — every host computes identical metrics, no cross-host gather needed.
    proc_shard = None
    if jax.process_count() > 1:
        proc_shard = (jax.process_index(), jax.process_count())
    loader_train = ds.DataLoader(
        dataset_train, config.batch_size, shuffle=True, drop_last=True,
        seed=config.seed, num_workers=config.num_workers, shard=proc_shard,
    )
    loader_val = ds.DataLoader(dataset_val, config.batch_size, num_workers=config.num_workers)
    loader_cider = ds.DataLoader(dataset_cider, config.batch_size, num_workers=config.num_workers)

    steps_per_epoch = len(loader_train)
    tx = make_optimizer(config, steps_per_epoch)
    state = TrainState(params, tx.init(params), jax.numpy.int32(0))
    train_step = make_train_step(config, tx)
    eval_step = make_eval_step(config)

    start_epoch = config.start_epoch
    if resume:
        latest = ckpt.latest_checkpoint(config.checkpoint_path, config)
        if latest is not None:
            state, meta = ckpt.load_checkpoint(latest, state)
            start_epoch = meta["epoch"] + 1
            logger.log("resume", checkpoint=latest, epoch=start_epoch)

    saver = ckpt.AsyncSaver() if config.async_checkpoints else None

    cider_scores = [0.0]
    try:
        for epoch in range(start_epoch, config.epochs):
            logger.log("epoch_start", epoch=epoch)
            state, epoch_loss = train_one_epoch(
                state, train_step, loader_train, key, epoch=epoch, logger=logger,
                mesh=mesh,
            )
            validation_loss = evaluate(state.params, config, loader_val,
                                       eval_step=eval_step, mesh=mesh)
            if mesh is not None:
                from retr_tpu.parallel.sweep import eval_model_sharded

                eval_results = eval_model_sharded(
                    state.params, config, loader_cider, tokenizer, mesh
                )
            else:
                eval_results, _ = eval_model(state.params, config, loader_cider, tokenizer)
            cider_score = eval_results["CIDEr"]
            logger.log(
                "epoch_end", epoch=epoch, train_loss=epoch_loss,
                val_loss=validation_loss, cider=cider_score, metrics=eval_results,
            )

            save_kwargs = dict(
                epoch=epoch, train_loss=epoch_loss, val_loss=validation_loss,
                cider_score=cider_score,
            )
            if saver is not None:
                saver.submit(config.checkpoint_path, state, config, **save_kwargs)
            else:
                ckpt.save_checkpoint(config.checkpoint_path, state, config, **save_kwargs)

            if config.early_stopping and cider_score < min(cider_scores[-5:]):
                logger.log("early_stop", epoch=epoch)  # main.py:96-99 semantics
                break
            cider_scores.append(cider_score)
    finally:
        # join the in-flight save even when training raises (NaN stop, ^C): the
        # submitted PRE-crash epoch must persist durably, matching the sync
        # path's guarantee. If both raise, Python chains the exceptions.
        if saver is not None:
            saver.wait()
    logger.close()


def cli(argv=None) -> None:
    """Console entry point (`retr-train` / `python -m retr_tpu.main`)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="", help="JSON config file (defaults otherwise)")
    ap.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    ap.add_argument("--init_pth", default="",
                    help="initialize weights from a reference-format .pth and "
                    "train from there (fine-tuning; optimizer state starts fresh)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host launch: jax.distributed.initialize() (TPU pods "
                    "auto-detect coordinator/rank from the environment), then the "
                    "same main() — per-host data sharding and global batch assembly "
                    "are automatic once process_count > 1. See docs/MULTIHOST.md")
    args = ap.parse_args(argv)
    if args.distributed:
        jax.distributed.initialize()
    cfg = Config.from_json(open(args.config).read()) if args.config else Config()
    main(cfg, resume=args.resume, init_pth=args.init_pth)


if __name__ == "__main__":
    cli()
