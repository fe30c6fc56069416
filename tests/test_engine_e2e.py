"""End-to-end integration: main-loop training on the synthetic fixture, engine eval
with NLG metrics, checkpoint save/restore round trip, reference .pth import."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from retr_tpu import engine
from retr_tpu.config import Config
from retr_tpu.data import dataset as ds
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.models import caption
from retr_tpu.train import checkpoints as ckpt
from retr_tpu.train.state import TrainState, make_eval_step, make_optimizer, make_train_step
from tests.synth_refcoco import make_synth_refcoco


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    coco_dir, ref_dir = make_synth_refcoco(str(root), n_images=4)
    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        dir=coco_dir, ref_dir=ref_dir, verbose=False,
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=16,
        dropout=0.1, image_size=64, batch_size=2, num_workers=2,
        project_data_path=str(root / "data"),
    )
    return cfg, tok


def test_train_eval_checkpoint_cycle(env):
    cfg, tok = env
    train_ds = ds.build_dataset(cfg, "training", tokenizer=tok)
    loader = ds.DataLoader(train_ds, cfg.batch_size, shuffle=True, drop_last=True, num_workers=2)
    cider_ds = ds.build_dataset(cfg, "training", tokenizer=tok, return_unique=True)
    cider_loader = ds.DataLoader(cider_ds, cfg.batch_size, num_workers=2)

    params, _ = caption.build_model(cfg, jax.random.key(0))
    tx = make_optimizer(cfg, steps_per_epoch=len(loader))
    state = TrainState(params, tx.init(params), jnp.int32(0))
    # donate=True matches main()'s production step, so the suite compiles ONE
    # train-step executable for this config (train.state._program_key memo)
    step = make_train_step(cfg, tx)

    state, loss0 = engine.train_one_epoch(state, step, loader, jax.random.key(1), epoch=0)
    state, loss1 = engine.train_one_epoch(state, step, loader, jax.random.key(1), epoch=1)
    assert np.isfinite(loss0) and np.isfinite(loss1)

    val_loss = engine.evaluate(state.params, cfg, cider_loader, eval_step=make_eval_step(cfg))
    assert np.isfinite(val_loss)

    metrics, ids_hyps = engine.eval_model(state.params, cfg, cider_loader, tok)
    assert {"Bleu_1", "CIDEr", "METEOR", "ROUGE_L"} <= set(metrics)
    assert len(ids_hyps) == len(cider_ds)
    assert all("expression" in h for h in ids_hyps)

    # -- checkpoint round trip
    path = ckpt.save_checkpoint(
        cfg.checkpoint_path, state, cfg, epoch=1, train_loss=loss1,
        val_loss=val_loss, cider_score=metrics["CIDEr"],
    )
    assert os.path.isdir(path)
    meta = ckpt.read_metadata(path)
    assert meta["epoch"] == 1 and meta["config"]["hidden_dim"] == 64

    # template from the LIVE state: the donating step consumed the original
    # `params` buffers (donate_argnums frees inputs)
    template = TrainState(state.params, tx.init(state.params), jnp.int32(0))
    restored, meta2 = ckpt.load_checkpoint(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["mlp"]["layers"][0]["w"]),
        np.asarray(state.params["mlp"]["layers"][0]["w"]),
    )
    assert int(restored.step) == int(state.step)

    # latest_checkpoint finds it; config round-trips
    assert ckpt.latest_checkpoint(cfg.checkpoint_path, cfg) == path
    cfg2 = ckpt.config_from_checkpoint(path)
    assert cfg2.hidden_dim == cfg.hidden_dim


def test_beam_eval_path(env):
    cfg, tok = env
    cider_ds = ds.build_dataset(cfg, "training", tokenizer=tok, return_unique=True)
    cider_loader = ds.DataLoader(cider_ds, cfg.batch_size, num_workers=2)
    params, _ = caption.build_model(cfg, jax.random.key(2))
    cfg_beam = cfg.replace(beam_size=2)
    metrics, _ = engine.eval_model(params, cfg_beam, cider_loader, tok, decoder="beam")
    assert "CIDEr" in metrics


def test_sample_eval_path(env):
    """decoder='sample': temperature=0 reproduces greedy metrics+hypotheses exactly;
    stochastic runs are reproducible (PRNG keyed on cfg.seed + batch index)."""
    cfg, tok = env
    cider_ds = ds.build_dataset(cfg, "training", tokenizer=tok, return_unique=True)
    cider_loader = ds.DataLoader(cider_ds, cfg.batch_size, num_workers=2)
    params, _ = caption.build_model(cfg, jax.random.key(2))

    m_greedy, h_greedy = engine.eval_model(params, cfg, cider_loader, tok)
    cfg0 = cfg.replace(sample_temperature=0.0)
    m0, h0 = engine.eval_model(params, cfg0, cider_loader, tok, decoder="sample")
    assert h0 == h_greedy and m0 == m_greedy

    cfg1 = cfg.replace(sample_temperature=1.0, sample_top_k=8)
    _, h1 = engine.eval_model(params, cfg1, cider_loader, tok, decoder="sample")
    _, h2 = engine.eval_model(params, cfg1, cider_loader, tok, decoder="sample")
    assert h1 == h2


def test_reference_pth_import(env, tmp_path):
    """Save a reference-format torch checkpoint from the oracle; import; compare
    forward logits."""
    from tests import torch_oracle

    cfg, tok = env
    torch.manual_seed(5)
    tm = torch_oracle.CaptionModel(
        backbone_name=cfg.backbone, dilation=cfg.dilation, vocab=cfg.vocab_size,
        d=cfg.hidden_dim, h=cfg.nheads, nenc=cfg.enc_layers, ndec=cfg.dec_layers,
        dff=cfg.dim_feedforward, max_pos=cfg.max_position_embeddings,
    ).eval()
    # oracle mlp is d->2d->2d->vocab; reference head is d->512->512->vocab. The
    # importer reads whatever dims are in the state dict — shape-agnostic.
    pth = tmp_path / "Concat_refcoco_checkpoint_0.pth"
    torch.save({"model_state_dict": tm.state_dict(), "epoch": 0, "cider_score": 0.5}, str(pth))

    params, meta = ckpt.import_reference_checkpoint(str(pth), cfg)
    assert meta["epoch"] == 0

    from retr_tpu.masking import Masked

    img = torch.randn(2, 3, cfg.image_size, cfg.image_size)
    mask = torch.zeros(2, cfg.image_size, cfg.image_size, dtype=torch.bool)
    caps = torch.randint(0, cfg.vocab_size, (2, cfg.max_position_embeddings))
    cmask = torch.zeros(2, cfg.max_position_embeddings, dtype=torch.bool)
    with torch.no_grad():
        ref = tm(img, mask, caps, cmask).numpy()
    got = caption.forward(
        params, cfg, Masked(jnp.asarray(img.numpy()), jnp.asarray(mask.numpy())),
        jnp.asarray(caps.numpy()), jnp.asarray(cmask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)


def test_override_config_filename_sniffing():
    cfg = Config()
    c1 = ckpt.override_config_with_reference_filename(cfg, "/x/Concat_refcoco_loc_checkpoint_3.pth")
    assert c1.use_location_features and not c1.use_global_features
    c2 = ckpt.override_config_with_reference_filename(cfg, "/x/Concat_refcoco_loc_glob_checkpoint_3.pth")
    assert c2.use_location_features and c2.use_global_features
    c3 = ckpt.override_config_with_reference_filename(cfg, "/x/Concat_refcoco_checkpoint_3.pth")
    assert not c3.use_location_features and not c3.use_global_features


@pytest.mark.slow
def test_deterministic_resume(env, tmp_path):
    """Step-exact resume: save mid-training, continue, and the continued losses are
    bit-identical to an uninterrupted run (deterministic recovery, SURVEY.md §5)."""
    import jax.numpy as jnp

    from retr_tpu.train.state import Batch

    cfg, tok = env
    rng = np.random.default_rng(7)
    t = cfg.max_position_embeddings + 1
    caps = rng.integers(3, min(200, cfg.vocab_size), (2, t)).astype(np.int32)
    caps[:, 0] = 101
    batch = Batch(
        images=jnp.asarray(rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)), jnp.float32),
        image_masks=jnp.zeros((2, cfg.image_size, cfg.image_size), bool),
        caps=jnp.asarray(caps),
        cap_masks=jnp.asarray(caps == 0),
    )

    from retr_tpu.models import caption as cap_mod
    from retr_tpu.train.state import TrainState, make_optimizer, make_train_step

    params, _ = cap_mod.build_model(cfg, jax.random.key(5))
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(cfg, tx, donate=False)
    key = jax.random.key(9)

    # uninterrupted: 4 steps
    s = TrainState(params, tx.init(params), jnp.int32(0))
    losses_a = []
    for _ in range(4):
        s, l = step(s, batch, key)
        losses_a.append(float(l))

    # interrupted: 2 steps, save, restore, 2 more
    s2 = TrainState(params, tx.init(params), jnp.int32(0))
    for _ in range(2):
        s2, _ = step(s2, batch, key)
    path = ckpt.save_checkpoint(str(tmp_path / "ckpt"), s2, cfg, epoch=0)
    template = TrainState(params, tx.init(params), jnp.int32(0))
    s3, _ = ckpt.load_checkpoint(path, template)
    losses_b = []
    for _ in range(2):
        s3, l = step(s3, batch, key)
        losses_b.append(float(l))

    assert losses_a[2:] == losses_b, (losses_a, losses_b)


def test_export_reference_checkpoint_roundtrip(env, tmp_path):
    """params -> reference .pth -> import is bit-exact (incl. the BN fold inverse),
    and the exported model_state_dict loads strict=True into the reference-named
    torch module tree (tests/torch_oracle.CaptionModel) — so reference users can
    consume checkpoints trained here (eval_model.py:26-28)."""
    cfg, _ = env
    params, _ = caption.build_model(cfg, jax.random.key(5))
    pth = str(tmp_path / "Concat_refcoco_checkpoint_3.pth")
    ckpt.export_reference_checkpoint(params, cfg, pth, epoch=3, cider_score=0.5)

    params2, meta = ckpt.import_reference_checkpoint(pth, cfg)
    assert meta["epoch"] == 3 and meta["cider_score"] == 0.5
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    assert len(flat1) == len(flat2)
    for k, v in flat1:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(k)]), err_msg=str(k)
        )

    from tests import torch_oracle

    tm = torch_oracle.CaptionModel(
        backbone_name=cfg.backbone, dilation=cfg.dilation, vocab=cfg.vocab_size,
        d=cfg.hidden_dim, h=cfg.nheads, nenc=cfg.enc_layers, ndec=cfg.dec_layers,
        dff=cfg.dim_feedforward, max_pos=cfg.max_position_embeddings,
    )
    # the reference head is d->512->512->vocab (models/caption.py:21); the oracle's
    # default is d->2d — swap in the reference-shaped head for the strict load
    tm.mlp = torch_oracle.MLP(cfg.hidden_dim, 512, cfg.vocab_size)
    blob = torch.load(pth, map_location="cpu", weights_only=False)
    tm.load_state_dict(blob["model_state_dict"], strict=True)


def test_export_reference_checkpoint_loc_variant(env, tmp_path):
    cfg, _ = env
    cfg_loc = cfg.replace(use_location_features=True)
    params, _ = caption.build_model(cfg_loc, jax.random.key(6))
    pth = str(tmp_path / "Concat_refcoco_loc_checkpoint_0.pth")
    ckpt.export_reference_checkpoint(params, cfg_loc, pth)
    params2, _ = ckpt.import_reference_checkpoint(pth, cfg_loc)
    np.testing.assert_array_equal(
        np.asarray(params["loc_proj"]["w"]), np.asarray(params2["loc_proj"]["w"])
    )


def test_export_pth_cli(env, tmp_path, monkeypatch):
    """python -m retr_tpu.export_pth writes a loadable .pth with metadata carried
    from the checkpoint dir."""
    import sys

    from retr_tpu import export_pth

    cfg, _ = env
    params, _ = caption.build_model(cfg, jax.random.key(8))
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), state, cfg, epoch=4,
                                cider_score=0.7)
    out = str(tmp_path / "exported.pth")
    monkeypatch.setattr(sys, "argv", ["export_pth", "--checkpoint", path, "--out", out])
    assert export_pth.main() == out
    blob = torch.load(out, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 4 and blob["cider_score"] == 0.7
    params2, _ = ckpt.import_reference_checkpoint(out, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["mlp"]["layers"][0]["w"]),
        np.asarray(params2["mlp"]["layers"][0]["w"]),
    )
