"""dp-sharded eval sweep on the virtual 8-device CPU mesh + decode helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retr_tpu import decode
from retr_tpu.config import Config
from retr_tpu.data import dataset as ds
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.masking import Masked
from retr_tpu.models import caption
from retr_tpu.parallel import mesh as pmesh
from retr_tpu.parallel import sweep
from tests.synth_refcoco import make_synth_refcoco


def make_env(tmp_path):
    coco_dir, ref_dir = make_synth_refcoco(str(tmp_path), n_images=4)
    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        dir=coco_dir, ref_dir=ref_dir, verbose=False,
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=16, dropout=0.0, image_size=64, batch_size=4,
        num_workers=2,
    )
    return cfg, tok


def test_sharded_eval_matches_single_device(tmp_path):
    cfg, tok = make_env(tmp_path)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    dataset = ds.build_dataset(cfg, "training", tokenizer=tok, return_unique=True)
    loader = ds.DataLoader(dataset, cfg.batch_size, num_workers=2)

    from retr_tpu import engine

    ref_metrics, _ = engine.eval_model(params, cfg, loader, tok)

    mesh = pmesh.make_mesh(dp=4, mp=2)
    got_metrics = sweep.eval_model_sharded(params, cfg, loader, tok, mesh)

    for k in ("Bleu_1", "CIDEr", "ROUGE_L"):
        assert got_metrics[k] == np.float64(ref_metrics[k]) or abs(got_metrics[k] - ref_metrics[k]) < 1e-9, (
            k, got_metrics[k], ref_metrics[k])


def test_full_eval_sweep_api(tmp_path):
    cfg, tok = make_env(tmp_path)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    mesh = pmesh.make_mesh(dp=8, mp=1)
    loaders = {
        "refcoco/train-as-val": ds.DataLoader(
            ds.build_dataset(cfg, "training", tokenizer=tok, return_unique=True),
            cfg.batch_size, num_workers=2,
        ),
    }
    out = sweep.full_eval_sweep(params, cfg, tok, mesh, datasets=loaders)
    assert "refcoco/train-as-val" in out and "CIDEr" in out["refcoco/train-as-val"]


def test_pad_host_batch():
    from retr_tpu.data.dataset import HostBatch

    hb = HostBatch(
        ann_ids=np.arange(3),
        target_images=np.zeros((3, 4, 4, 3), np.uint8),
        target_masks=np.zeros((3, 4, 4), bool),
        caps=np.zeros((3, 5), np.int32),
        cap_masks=np.zeros((3, 5), bool),
    )
    out = sweep.pad_host_batch(hb, 8)
    assert out.target_images.shape[0] == 8
    assert out.context_images is None


def test_greedy_with_attention_helper():
    cfg = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=96, max_position_embeddings=8,
        dropout=0.0, image_size=32,
    )
    params, _ = caption.build_model(cfg, jax.random.key(1))
    img = jax.random.normal(jax.random.key(2), (1, 3, 32, 32))
    samples = Masked(img, jnp.zeros((1, 32, 32), bool))
    ids, atts = decode.greedy_with_attention(
        params, cfg, samples, max_len=8, bos_token=90, eos_token=91
    )
    assert ids.shape == (1, 8)
    assert set(atts) == {"enc_tc_self_att", "dec_exp_self_att", "dec_exp_tc_cross_att"}
    assert atts["dec_exp_self_att"].shape[0] == cfg.dec_layers


def test_sweep_cli_end_to_end(tmp_path):
    """Train a checkpoint on the fixture, then run the sweep CLI against it."""
    import jax

    from retr_tpu import sweep_cli
    from retr_tpu.train import checkpoints as ckpt
    from retr_tpu.train.state import TrainState, make_optimizer

    cfg, tok = make_env(tmp_path)
    cfg = cfg.replace(
        project_data_path=str(tmp_path / "data"), checkpoint_path="",
        ref_base=str(tmp_path / "refs"),  # synth layout: <root>/refs/refcoco
        prefix="refcoco",
    )
    params, _ = caption.build_model(cfg, jax.random.key(0))
    tx = make_optimizer(cfg, 10)
    state = TrainState(params, tx.init(params), jax.numpy.int32(0))
    path = ckpt.save_checkpoint(cfg.checkpoint_path, state, cfg, epoch=0)

    args = sweep_cli.build_argparser().parse_args(
        ["--checkpoint", path, "--datasets", "refcoco:train", "--dp", "4",
         "--out", str(tmp_path / "sweep.json"), "--override_config"]
    )
    results = sweep_cli.main(args, cfg)
    assert "refcoco/train" in results and "CIDEr" in results["refcoco/train"]
    import json as _json

    assert "refcoco/train" in _json.load(open(tmp_path / "sweep.json"))

    # --mp 2: tensor-parallel eval through the CLI (params sharded via
    # parallel.mesh.shard_params on a dp=2 x mp=2 mesh) scores identically
    import pytest as _pytest

    args2 = sweep_cli.build_argparser().parse_args(
        ["--checkpoint", path, "--datasets", "refcoco:train", "--dp", "2",
         "--mp", "2", "--override_config"]
    )
    results2 = sweep_cli.main(args2, cfg)
    assert results2["refcoco/train"]["CIDEr"] == _pytest.approx(
        results["refcoco/train"]["CIDEr"], abs=1e-6
    )

    # --store-generations: hypotheses persisted per dataset/split
    gen_path = tmp_path / "gens.json"
    args3 = sweep_cli.build_argparser().parse_args(
        ["--checkpoint", path, "--datasets", "refcoco:train", "--dp", "4",
         "--store-generations", str(gen_path), "--override_config"]
    )
    results3 = sweep_cli.main(args3, cfg)
    assert results3["refcoco/train"]["CIDEr"] == _pytest.approx(
        results["refcoco/train"]["CIDEr"]
    )
    gens = _json.load(open(gen_path))
    assert gens.keys() == {"refcoco/train"}
    assert len(gens["refcoco/train"]) > 0
    assert all(isinstance(h, str) for h in gens["refcoco/train"])


@pytest.mark.slow
def test_greedy_under_tensor_parallel_mesh(tmp_path):
    """Greedy decode with mp-sharded params (vocab head + FFN + attention heads split
    over the mp axis) must equal the replicated run — the XLA partitioner inserts the
    collectives inside the decode while-loop."""
    cfg, tok = make_env(tmp_path)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    img = jax.random.normal(jax.random.key(3), (8, 3, cfg.image_size, cfg.image_size))
    samples = Masked(img, jnp.zeros((8, cfg.image_size, cfg.image_size), bool))
    kw = dict(max_len=cfg.max_position_embeddings, bos_token=101, eos_token=102)

    ref = np.asarray(decode.greedy(params, cfg, samples, **kw))

    mesh = pmesh.make_mesh(dp=4, mp=2)
    sharded = pmesh.shard_params(params, mesh)
    sh_samples = Masked(*sweep.shard_batch(tuple(samples), mesh))
    got = np.asarray(decode.greedy(sharded, cfg, sh_samples, **kw))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_sharded_beam_and_sample_match_single_device(tmp_path):
    """decoder='beam' and 'sample' through the dp-sharded sweep produce exactly the
    single-device engine's hypotheses (beam tiles the sharded batch to B*K rows;
    sampling's counter-based PRNG is sharding-invariant)."""
    cfg, tok = make_env(tmp_path)
    cfg = cfg.replace(beam_size=2, sample_temperature=1.0, sample_top_k=4)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    dataset = ds.build_dataset(cfg, "training", tokenizer=tok, return_unique=True)
    loader = ds.DataLoader(dataset, cfg.batch_size, num_workers=2)

    from retr_tpu import engine

    mesh = pmesh.make_mesh(dp=4, mp=1)
    for decoder in ("beam", "sample"):
        _, ref_hyps = engine.eval_model(params, cfg, loader, tok, decoder=decoder)
        _, got_hyps = sweep.eval_model_sharded(
            params, cfg, loader, tok, mesh, decoder=decoder, return_hypotheses=True
        )
        assert [h["expression"] for h in ref_hyps] == got_hyps, decoder


@pytest.mark.slow
def test_evaluate_mesh_matches_single_device(tmp_path):
    """engine.evaluate with a dp mesh returns the same validation loss as the
    unsharded path (including a ragged trailing batch, which is replicated)."""
    cfg, tok = make_env(tmp_path)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    dataset = ds.build_dataset(cfg, "training", tokenizer=tok)
    loader = ds.DataLoader(dataset, 3, num_workers=2)  # 4 anns -> batches of 3+1 (ragged)

    from retr_tpu import engine

    ref = engine.evaluate(params, cfg, loader)
    mesh = pmesh.make_mesh(dp=3, mp=1)
    p_mesh = jax.device_put(params, pmesh.replicated(mesh))
    got = engine.evaluate(p_mesh, cfg, loader, mesh=mesh)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_global_batch_from_local_single_process():
    """Single-process equivalence of the multi-host batch assembly: same values
    and sharding as the plain device_put path (engine._shard_batch_on)."""
    mesh = pmesh.make_mesh(dp=4, mp=1)
    x = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
    tree = {"a": x, "b": None}
    g = pmesh.global_batch_from_local(mesh, tree)
    assert g["b"] is None
    ref = jax.device_put(jnp.asarray(x), pmesh.batch_sharding(mesh, 2))
    np.testing.assert_array_equal(np.asarray(g["a"]), np.asarray(ref))
    assert g["a"].sharding == ref.sharding


def test_sweep_cli_mp_validation():
    """--mp must divide the device count; validated before the checkpoint load."""
    import pytest

    from retr_tpu import sweep_cli

    args = sweep_cli.build_argparser().parse_args(["--checkpoint", "x", "--mp", "3"])
    with pytest.raises(ValueError, match="must divide the device count"):
        sweep_cli.main(args, Config())
