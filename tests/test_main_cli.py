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
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=12, dropout=0.1, image_size=48, batch_size=2,
        num_workers=2, epochs=2, early_stopping=False,
        project_data_path=str(root / "data"),
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
