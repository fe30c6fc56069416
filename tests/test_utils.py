"""Observability utilities: JSONL logger, phase timer, config round-trips."""

import json
import time

import pytest

from retr_tpu.config import Config
from retr_tpu.utils.logging import MetricLogger
from retr_tpu.utils.profiling import PhaseTimer


def test_metric_logger_jsonl(tmp_path):
    path = tmp_path / "m" / "metrics.jsonl"
    with MetricLogger(str(path), also_stdout=False) as log:
        log.log("epoch_end", epoch=0, loss=1.5)
        log.log("train_step", step=1, loss=1.2)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["event"] == "epoch_end" and lines[0]["loss"] == 1.5
    assert "t" in lines[0]


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("encode"):
        time.sleep(0.01)
    with t.phase("encode"):
        time.sleep(0.01)
    with t.phase("decode"):
        pass
    s = t.summary()
    assert s["encode"]["count"] == 2
    assert s["encode"]["p50_s"] >= 0.009
    assert "decode" in s


def test_config_json_roundtrip():
    cfg = Config(backbone="ResNet50", hidden_dim=128, use_location_features=True)
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg2.head_dim == 128 // cfg2.nheads


def test_config_validation():
    with pytest.raises(ValueError):
        Config(backbone="VGG16")
    with pytest.raises(ValueError):
        Config(hidden_dim=100, nheads=8)
    with pytest.raises(ValueError):
        Config(position_embedding="fourier")


def test_config_reference_knobs_present():
    """Every knob from the reference Config (configuration_template.py:4-57) exists."""
    cfg = Config()
    for knob in [
        "prefix", "lr_backbone", "lr", "epochs", "lr_drop", "start_epoch",
        "weight_decay", "backbone", "position_embedding", "dilation", "device",
        "seed", "batch_size", "num_workers", "checkpoint", "project_data_path",
        "checkpoint_path", "clip_max_norm", "early_stopping", "use_global_features",
        "use_location_features", "verbose", "transformer_type", "hidden_dim",
        "pad_token_id", "max_position_embeddings", "layer_norm_eps", "dropout",
        "vocab_size", "enc_layers", "dec_layers", "dim_feedforward", "nheads",
        "pre_norm", "dir", "ref_base", "ref_dir", "limit",
    ]:
        assert hasattr(cfg, knob), knob


def test_pack_encoder_inputs_matrix(rng=None):
    """Reference engine.pack_encoder_inputs semantics across the flag matrix."""
    import numpy as np

    from retr_tpu.engine import pack_encoder_inputs

    img = np.zeros((2, 3, 8, 8), np.float32)
    mask = np.zeros((2, 8, 8), bool)
    loc = np.zeros((2, 5), np.float32)

    s, g, l = pack_encoder_inputs((img, mask), False, False)
    assert g is None and l is None and s.tensors.shape == img.shape
    s, g, l = pack_encoder_inputs((img, mask, img, mask), True, False)
    assert g is not None and l is None
    s, g, l = pack_encoder_inputs((img, mask, loc), False, True)
    assert g is None and l.shape == (2, 5)
    s, g, l = pack_encoder_inputs((img, mask, img, mask, loc), True, True)
    assert g is not None and l is not None


def test_time_chained_counts_applications():
    """The differential fori-chain must trace fn exactly once (one compile per
    chain depth) and must not let XLA DCE the body (the scalar tap reads every
    leaf). The returned time is wall-clock arithmetic, so on a loaded 1-core
    host the small-k differential can legitimately go negative — assert it is a
    finite float, not its sign (serial application itself is proven
    deterministically by test_chain_apply_thread_mode_threads_state)."""
    import math

    import jax.numpy as jnp

    from retr_tpu.utils.timing import chain_apply, time_chained

    calls = {"n": 0}

    def fn(x):
        calls["n"] += 1  # traced once only
        return (x @ x) * 1e-3

    x = jnp.eye(64)
    t = time_chained(fn, x, k=4, rounds=2)
    assert isinstance(t, float) and math.isfinite(t)
    # Sanity bound: a 64x64 matmul differential can jitter negative under host
    # load, but a *systematically* broken differential (e.g. (T(2k)-T(k))
    # missing the /k) would blow far past 1 s on this op. Generous ceiling, not
    # a timing assertion.
    assert abs(t) < 1.0, f"per-application differential implausible: {t}s"
    assert calls["n"] == 1  # one trace serves every chain depth
    # Higher-k positive-time check: at k=64 the chained matmul work dominates
    # host jitter on every rig we run on; flaky-tolerant via a single retry.
    t_big = time_chained(fn, x, k=64, rounds=2)
    if t_big <= 0:
        t_big = time_chained(fn, x, k=64, rounds=3)
    assert t_big > 0, f"k=64 differential still non-positive: {t_big}s"

    # pytree outputs: every leaf is tapped (a dict output must work)
    run = chain_apply(lambda x: {"a": x.sum(), "b": x * 2.0})
    out = run(x, jnp.int32(3))
    assert jnp.isfinite(out)


def test_config_field_classification_single_source():
    """Every compile-cache skip list derives from config.py's one classification
    table: tuples are disjoint, name real fields, and a field added to Config
    without classification lands in BOTH program keys (traced-by-default = safe:
    worst case a recompile, never a stale executable)."""
    import dataclasses

    from retr_tpu import config as config_mod
    from retr_tpu.train.state import _program_key

    names = {f.name for f in dataclasses.fields(config_mod.Config)}
    tables = ("HOST_ONLY_FIELDS", "TRAIN_ONLY_FIELDS", "DECODE_ONLY_FIELDS")
    for t in tables:
        tup = getattr(config_mod, t)
        assert len(set(tup)) == len(tup), f"{t} has duplicates"
        assert set(tup) <= names, f"{t} names non-fields: {set(tup) - names}"
    for a in tables:
        for b in tables:
            if a < b:
                overlap = set(getattr(config_mod, a)) & set(getattr(config_mod, b))
                assert not overlap, (a, b, overlap)
    assert set(config_mod.DECODE_NEUTRAL_FIELDS) == (
        set(config_mod.HOST_ONLY_FIELDS) | set(config_mod.TRAIN_ONLY_FIELDS) | {"dropout"}
    )

    # host-only fields fragment neither key; train knobs stay in the train key;
    # decode-search knobs stay in the decode cfg but out of the train key
    base = Config()
    assert _program_key(base) == _program_key(base.replace(checkpoint_path="/elsewhere"))
    assert _program_key(base) != _program_key(base.replace(lr=base.lr * 2))
    assert _program_key(base) == _program_key(base.replace(beam_size=base.beam_size + 1))
    pc = config_mod.program_config
    assert pc(base) == pc(base.replace(lr=base.lr * 2))
    assert pc(base) != pc(base.replace(beam_size=base.beam_size + 1))


def test_commit_to_local_device_uses_addressable_device():
    """Param commits go to jax.local_devices()[0], never jax.devices()[0]: under
    multi-host the global list's first device is non-addressable on every
    process but 0 (retr_tpu/device.py)."""
    import jax
    import jax.numpy as jnp

    from retr_tpu.device import commit_to_local_device, default_local_device

    assert default_local_device() == jax.local_devices()[0]
    tree = {"w": jnp.ones((2, 2)), "b": jnp.zeros((2,))}
    out = commit_to_local_device(tree)
    for leaf in jax.tree.leaves(out):
        assert leaf.devices() == {jax.local_devices()[0]}


def test_chain_apply_thread_mode_threads_state():
    """thread=True feeds each output back as the next input (production
    state-threading semantics for train-step timing): k applications of x+1
    must yield k, and the non-threaded mode must NOT accumulate."""
    import jax.numpy as jnp

    from retr_tpu.utils.timing import chain_apply

    fn = lambda x: x + 1.0
    x0 = jnp.zeros((2,))
    assert float(chain_apply(fn, thread=True)(x0, jnp.int32(5))) == 5.0
    assert float(chain_apply(fn)(x0, jnp.int32(5))) < 2.0
