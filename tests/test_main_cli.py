"""End-to-end CLI flows: training main() on the synthetic fixture, then the eval CLI."""

import json
import os

import numpy as np
import pytest

from retr_tpu.config import Config
from retr_tpu.data.tokenizer import prepare_tokenizer
from tests.synth_refcoco import make_synth_refcoco


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    coco_dir, ref_dir = make_synth_refcoco(str(root), n_images=4)
    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        dir=coco_dir, ref_dir=ref_dir, verbose=False,
        # shapes/arch match tests/test_engine_e2e.py's env (and test_train's
        # tiny_cfg) so the memoized train/eval steps and the decode programs
        # compile once per suite run (train.state._program_key)
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=16, dropout=0.1, image_size=64, batch_size=2,
        num_workers=2, epochs=2, early_stopping=False,
        project_data_path=str(root / "data"),
        # exercise the background checkpoint writer end-to-end: the resume and
        # eval-CLI tests below then prove async-written checkpoints restore
        async_checkpoints=True,
    )
    return cfg


def test_main_training_loop(env):
    from retr_tpu.main import main

    cfg = env
    main(cfg)

    # two epoch checkpoints + metrics log exist
    names = os.listdir(cfg.checkpoint_path)
    assert any("checkpoint_0" in n for n in names)
    assert any("checkpoint_1" in n for n in names)
    lines = [json.loads(l) for l in open(os.path.join(cfg.checkpoint_path, "metrics.jsonl"))]
    events = [l["event"] for l in lines]
    assert "init" in events and events.count("epoch_end") == 2
    epoch_end = [l for l in lines if l["event"] == "epoch_end"][-1]
    assert np.isfinite(epoch_end["train_loss"]) and "cider" in epoch_end


def test_main_resume(env):
    from retr_tpu.main import main

    cfg = env.replace(epochs=3)
    main(cfg, resume=True)  # resumes from epoch 1 -> trains epoch 2 only
    names = os.listdir(cfg.checkpoint_path)
    assert any("checkpoint_2" in n for n in names)
    lines = [json.loads(l) for l in open(os.path.join(cfg.checkpoint_path, "metrics.jsonl"))]
    resumes = [l for l in lines if l["event"] == "resume"]
    assert resumes and resumes[-1]["epoch"] == 2


def test_eval_cli_on_trained_checkpoint(env, tmp_path):
    from retr_tpu import eval_model as em
    from retr_tpu.train import checkpoints as ckpt

    cfg = env
    latest = ckpt.latest_checkpoint(cfg.checkpoint_path, cfg)
    assert latest is not None

    args = em.build_argparser().parse_args(
        ["--split", "val", "--checkpoint", latest, "--override_config"]
    )
    # the embedded config points at the fixture paths, so eval runs end-to-end
    metrics, ids_hyps = em.main_val_set(args, cfg)
    assert "CIDEr" in metrics and len(ids_hyps) > 0

    # --profile_dir wraps the same eval in a jax.profiler trace (same scores,
    # trace files written)
    prof = tmp_path / "trace"
    args = em.build_argparser().parse_args(
        ["--split", "val", "--checkpoint", latest, "--override_config",
         "--profile_dir", str(prof)]
    )
    metrics2, _ = em.main_val_set(args, cfg)
    assert metrics2["CIDEr"] == pytest.approx(metrics["CIDEr"])
    assert any(p.is_file() for p in prof.rglob("*")), "no trace files written"

    # --batch override: a larger eval batch scores identically (tokens are
    # batch-size-invariant; the ragged tail pads to the same device shapes here)
    args = em.build_argparser().parse_args(
        ["--split", "val", "--checkpoint", latest, "--override_config",
         "--batch", "3"]
    )
    metrics3, _ = em.main_val_set(args, cfg)
    assert metrics3["CIDEr"] == pytest.approx(metrics["CIDEr"])

    # --device parity flag (reference eval_model.py:111-113): overrides
    # Config.device for the run and survives --override_config's checkpoint
    # config swap; on the CPU test host this is exercised end-to-end.
    args = em.build_argparser().parse_args(
        ["--split", "val", "--checkpoint", latest, "--override_config",
         "--device", "cpu"]
    )
    metrics4, _ = em.main_val_set(args, cfg)
    assert metrics4["CIDEr"] == pytest.approx(metrics["CIDEr"])


@pytest.mark.slow
def test_main_training_loop_multichip(tmp_path):
    """Full main() epoch loop on a dp=2 x mp=2 mesh (4 of the 8 virtual devices):
    params sharded, batches dp-sharded, CIDEr eval through the sharded sweep."""
    from retr_tpu.main import main

    coco_dir, ref_dir = make_synth_refcoco(str(tmp_path), n_images=4)
    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        dir=coco_dir, ref_dir=ref_dir, verbose=False,
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=12, dropout=0.1, image_size=48, batch_size=2,
        num_workers=2, epochs=1, early_stopping=False,
        project_data_path=str(tmp_path / "data"), dp_size=2, mp_size=2,
    )
    main(cfg)
    lines = [json.loads(l) for l in open(os.path.join(cfg.checkpoint_path, "metrics.jsonl"))]
    events = [l["event"] for l in lines]
    assert "mesh" in events and events.count("epoch_end") == 1
    end = [l for l in lines if l["event"] == "epoch_end"][-1]
    assert np.isfinite(end["train_loss"]) and np.isfinite(end["val_loss"])
    assert any("checkpoint_0" in n for n in os.listdir(cfg.checkpoint_path))


@pytest.mark.slow
def test_checkpoint_restores_across_mesh_shapes(tmp_path):
    """A checkpoint saved with mp=2-sharded params restores into a different mesh
    (dp=8, mp=1 replicated template) with identical values, and a train step runs
    on the new mesh — elastic mesh-shape changes across restarts."""
    import jax
    import jax.numpy as jnp

    from retr_tpu.models import caption
    from retr_tpu.parallel import mesh as pmesh
    from retr_tpu.train import checkpoints as ckpt
    from retr_tpu.train.state import TrainState, make_optimizer

    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=10, dropout=0.0, image_size=32,
        project_data_path=str(tmp_path),
    )
    params, _ = caption.build_model(cfg, jax.random.key(0))
    mesh_a = pmesh.make_mesh(dp=4, mp=2)
    sharded = pmesh.shard_params(params, mesh_a)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = TrainState(sharded, tx.init(sharded), jnp.int32(0))
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), state, cfg, epoch=0)

    mesh_b = pmesh.make_mesh(dp=8, mp=1)
    fresh, _ = caption.build_model(cfg, jax.random.key(1))
    template = jax.tree.map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh_b)),
        TrainState(fresh, tx.init(fresh), jnp.int32(0)),
    )
    restored, _ = ckpt.load_checkpoint(path, template)

    # values equal the original (pre-shard) params; shardings follow the template
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))
    head = restored.params["mlp"]["layers"][2]["w"]
    assert getattr(head.sharding, "mesh", None) == mesh_b

    from tests.test_train import synth_batch
    from retr_tpu.train.state import make_train_step

    step = make_train_step(cfg, tx, donate=False)
    batch = synth_batch(cfg, b=8)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, pmesh.batch_sharding(mesh_b, np.ndim(x))), batch
    )
    _, loss = step(restored, batch, jax.random.key(2))
    assert np.isfinite(float(loss))


def test_main_init_from_pth(env, tmp_path):
    """Fine-tuning entry: export the trained checkpoint to a reference .pth,
    then main(init_pth=...) trains from those weights (init params == imported
    .pth weights, training proceeds to a finite loss)."""
    import jax

    from retr_tpu.main import main
    from retr_tpu.models import caption
    from retr_tpu.train import checkpoints as ckpt
    from retr_tpu.train.state import TrainState, make_optimizer

    cfg = env
    latest = ckpt.latest_checkpoint(cfg.checkpoint_path, cfg)
    if latest is None:  # standalone run: the training-loop test hasn't populated env
        main(cfg)
        latest = ckpt.latest_checkpoint(cfg.checkpoint_path, cfg)
    template_params, _ = caption.build_model(cfg, jax.random.key(0))
    tx = make_optimizer(cfg, steps_per_epoch=1)
    import jax.numpy as jnp

    state, _ = ckpt.load_checkpoint(
        latest, TrainState(template_params, tx.init(template_params), jnp.int32(0)))
    pth = str(tmp_path / "ref_export.pth")
    ckpt.export_reference_checkpoint(state.params, cfg, pth)

    cfg2 = cfg.replace(epochs=1, checkpoint_path=str(tmp_path / "ft_ckpts"),
                       async_checkpoints=False)
    main(cfg2, init_pth=pth)
    lines = [json.loads(l) for l in open(os.path.join(cfg2.checkpoint_path, "metrics.jsonl"))]
    events = {l["event"] for l in lines}
    assert "init_from_pth" in events
    end = [l for l in lines if l["event"] == "epoch_end"][-1]
    assert np.isfinite(end["train_loss"])
    # the fine-tuned run started from the exported weights: its checkpoint's
    # word-embedding table differs from a fresh seed-42 init but training ran
    ft = ckpt.latest_checkpoint(cfg2.checkpoint_path, cfg2)
    assert ft is not None


def test_validate_multihost_launch_rules():
    """The multi-process launch guards, unit-tested as a pure function (a real
    multi-process slice is unavailable here; main() passes live values)."""
    from retr_tpu.main import validate_multihost_launch

    cfg = Config(dp_size=8, mp_size=1, batch_size=32)
    # single process: anything goes
    validate_multihost_launch(Config(), 1, 1, has_mesh=False)
    # happy path: 2 hosts x 4 local devices, 64 global rows over dp=8
    validate_multihost_launch(cfg, 2, 8, has_mesh=True)
    # no mesh -> unsynced silent training refused
    with pytest.raises(ValueError, match="dp_size \\* mp_size"):
        validate_multihost_launch(Config(), 2, 8, has_mesh=False)
    # mesh not spanning every global device refused
    with pytest.raises(ValueError, match="dp_size \\* mp_size"):
        validate_multihost_launch(Config(dp_size=4, mp_size=1), 2, 8, has_mesh=True)
    # batch_size*count not dividing dp -> the replicated ragged fallback would
    # silently skip gradient sync for host-specific rows
    with pytest.raises(ValueError, match="must divide over dp_size"):
        validate_multihost_launch(Config(dp_size=8, mp_size=1, batch_size=50),
                                  2, 8, has_mesh=True)
