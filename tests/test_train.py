"""Training-loop tests: label partition, LR schedule, loss decreases, dp/mp sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retr_tpu.config import Config
from retr_tpu.parallel import mesh as pmesh
from retr_tpu.train import state as tstate


def _tok_vocab():
    from retr_tpu.data.tokenizer import prepare_tokenizer

    return prepare_tokenizer()[0].vocab_size


def tiny_cfg(**kw):
    # shapes/arch match the engine_e2e / main_cli env fixtures so the memoized
    # train/eval steps (train.state._program_key) compile once per suite run
    base = dict(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=_tok_vocab(),
        max_position_embeddings=16, dropout=0.1, image_size=64, clip_max_norm=0.1,
    )
    base.update(kw)
    return Config(**base)


def synth_batch(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    t = cfg.max_position_embeddings + 1
    caps = rng.integers(3, cfg.vocab_size, (b, t)).astype(np.int32)
    caps[:, 0] = 1
    caps[:, 6:] = 0
    cap_masks = caps == 0
    return tstate.Batch(
        images=jnp.asarray(rng.normal(size=(b, 3, cfg.image_size, cfg.image_size)), jnp.float32),
        image_masks=jnp.zeros((b, cfg.image_size, cfg.image_size), bool),
        caps=jnp.asarray(caps),
        cap_masks=jnp.asarray(cap_masks),
    )


def test_cross_entropy_impls_agree():
    # the fused logsumexp form and the reference-shaped log_softmax+gather form
    # are the same function; pin values AND gradients equal (docs/PERF.md r4)
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 7, 33)), jnp.float32) * 5.0
    targets = jnp.asarray(rng.integers(0, 33, (4, 7)), jnp.int32)

    def with_impl(impl):
        prev, tstate.CE_IMPL = tstate.CE_IMPL, impl
        try:
            val, grad = jax.value_and_grad(tstate._cross_entropy)(logits, targets)
        finally:
            tstate.CE_IMPL = prev
        return float(val), np.asarray(grad)

    v_f, g_f = with_impl("fused")
    v_l, g_l = with_impl("logsoftmax")
    assert abs(v_f - v_l) < 1e-6
    np.testing.assert_allclose(g_f, g_l, atol=1e-7)


def test_param_labels_partition():
    cfg = tiny_cfg()
    params, _ = __import__("retr_tpu.models.caption", fromlist=["x"]).build_model(cfg, jax.random.key(0))
    labels = tstate.param_labels(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    lab = {jax.tree_util.keystr(p): v for p, v in flat}
    assert lab["['backbone']['conv1']['w']"] == "frozen"
    assert any(k.startswith("['backbone']['layer1']") and v == "frozen" for k, v in lab.items())
    # layer2+ convs train at backbone lr; every folded BN affine is frozen
    assert any("layer2" in k and v == "backbone" and "conv" in k for k, v in lab.items())
    assert all(v == "frozen" for k, v in lab.items() if "'bn" in k)
    assert lab["['input_proj']['w']"] == "rest"
    assert lab["['mlp']['layers'][0]['w']"] == "rest"


def test_step_lr_schedule():
    s = tstate.step_lr(1e-4, lr_drop_epochs=2, steps_per_epoch=10)
    assert s(0) == pytest.approx(1e-4)
    assert s(19) == pytest.approx(1e-4)
    assert s(20) == pytest.approx(1e-5)   # epoch 2 -> one drop
    assert s(40) == pytest.approx(1e-6)


import functools


@functools.lru_cache(maxsize=None)
def cached_step(cfg, steps_per_epoch=2):
    """One jit-compiled train step per config — XLA compile dominates test wall-clock
    on this 1-core host, so tests share the compiled executable. donate=True and
    steps_per_epoch=2 match what main()/the e2e cycle build on the 4-image fixture
    (len(train loader) = 2 at batch 2; schedule constants bake steps_per_epoch into
    the program), so the whole suite compiles ONE flagship-tiny train step."""
    tx = tstate.make_optimizer(cfg, steps_per_epoch)
    return tx, tstate.make_train_step(cfg, tx)


def test_train_smoke_loss_decreases():
    cfg = tiny_cfg()
    tx, step = cached_step(cfg)
    params0, _ = __import__("retr_tpu.models.caption", fromlist=["x"]).build_model(cfg, jax.random.key(0))
    state = tstate.TrainState(params0, tx.init(params0), jnp.int32(0))
    batch = synth_batch(cfg)
    key = jax.random.key(42)
    losses = []
    for _ in range(8):
        state, loss = step(state, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3, f"loss did not decrease: {losses}"
    assert np.isfinite(losses).all()


def test_pad_row_gradient_is_zero():
    cfg = tiny_cfg()
    tx, step = cached_step(cfg)
    params0, _ = __import__("retr_tpu.models.caption", fromlist=["x"]).build_model(cfg, jax.random.key(1))
    state = tstate.TrainState(params0, tx.init(params0), jnp.int32(0))
    table0 = np.asarray(state.params["transformer"]["embeddings"]["word"]["table"])
    before = table0[cfg.pad_token_id].copy()
    row5_before = table0[5].copy()  # snapshot: the donating step frees the inputs
    batch = synth_batch(cfg)
    # make sure token 5 occurs (as input AND target) so its row provably moves
    batch = batch._replace(caps=batch.caps.at[:, 1].set(5))
    state, _ = step(state, batch, jax.random.key(0))
    after = np.asarray(state.params["transformer"]["embeddings"]["word"]["table"][cfg.pad_token_id])
    np.testing.assert_array_equal(before, after)
    # a non-pad row does move
    moved = np.asarray(state.params["transformer"]["embeddings"]["word"]["table"][5])
    assert not np.allclose(moved, row5_before)


@pytest.mark.slow
def test_frozen_prefix_backward_is_pruned():
    """train=True stops gradients at the layer1 output (reference backbone.py:58-60
    freezes conv1/bn1/layer1; torch autograd prunes that backward subgraph — so do
    we): frozen-prefix grads are exactly zero, trainable grads are unchanged vs the
    unpruned backward (train=False with dropout=0 is the same function minus the
    stop_gradient)."""
    from retr_tpu.models import caption

    cfg = tiny_cfg(dropout=0.0)
    params, _ = caption.build_model(cfg, jax.random.key(2))
    batch = synth_batch(cfg)

    def grads_for(train):
        return jax.grad(tstate.loss_fn)(
            params, cfg, batch, jax.random.key(0), train=train
        )

    g_train, g_eval = grads_for(True), grads_for(False)

    for k in ("conv1", "bn1", "layer1"):
        for leaf in jax.tree.leaves(g_train["backbone"][k]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    # without the stop, the prefix gets real (nonzero) grads
    assert any(
        np.abs(np.asarray(leaf)).max() > 0
        for leaf in jax.tree.leaves(g_eval["backbone"]["layer1"])
    )
    # everything from layer2 up is bit-identical to the unpruned backward
    labels = tstate.param_labels(params)
    flat_t = jax.tree_util.tree_leaves_with_path(g_train)
    flat_e = {jax.tree_util.keystr(p): l for p, l in jax.tree_util.tree_leaves_with_path(g_eval)}
    flat_lab = {jax.tree_util.keystr(p): l for p, l in jax.tree_util.tree_leaves_with_path(labels)}
    checked = 0
    for path, leaf in flat_t:
        ks = jax.tree_util.keystr(path)
        if flat_lab[ks] != "frozen":
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_e[ks]))
            checked += 1
    assert checked > 10


@pytest.mark.slow
def test_dp_mp_sharded_train_step():
    """Full train step under a (dp=4, mp=2) mesh on the 8 virtual CPU devices."""
    assert len(jax.devices()) == 8
    # even vocab: the tokenizer-derived one (341) is odd, and shard_params
    # replicates any head whose vocab dim doesn't divide over mp
    cfg = tiny_cfg(vocab_size=64)
    mesh = pmesh.make_mesh(dp=4, mp=2)
    tx, step = cached_step(cfg)
    params0, _ = __import__("retr_tpu.models.caption", fromlist=["x"]).build_model(cfg, jax.random.key(0))
    # Production order (main.py): shard params over the mesh FIRST, then init
    # the optimizer from the sharded tree so m/v inherit the mesh placement.
    # Initing from the device-0-committed fresh params and swapping afterwards
    # hands jit a mix of single-device-committed opt state and 8-device params,
    # which it rejects.
    sharded_params = pmesh.shard_params(params0, mesh)
    state = tstate.TrainState(sharded_params, tx.init(sharded_params), jnp.int32(0))

    batch = synth_batch(cfg, b=8)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, pmesh.batch_sharding(mesh, np.ndim(x))), batch
    )
    # NamedSharding inputs carry the mesh; jit partitions without an ambient mesh.
    state2, loss = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    # params keep their shardings through the update
    head_w = state2.params["mlp"]["layers"][2]["w"]
    assert "mp" in str(head_w.sharding.spec)


def test_nonfinite_loss_detection():
    """Failure-detection guard: a poisoned batch must raise NonFiniteLossError
    (reference NaN hard-exit, engine.py:75-77, as a catchable error)."""
    from retr_tpu import engine

    cfg = tiny_cfg()
    tx, step = cached_step(cfg)
    params0, _ = __import__("retr_tpu.models.caption", fromlist=["x"]).build_model(cfg, jax.random.key(3))
    state = tstate.TrainState(params0, tx.init(params0), jnp.int32(0))
    bad = synth_batch(cfg)._replace(images=jnp.full_like(synth_batch(cfg).images, jnp.inf))

    class OneBatchLoader:
        dataset = None

        def __iter__(self):
            yield bad

    orig = engine.device_batch  # engine binds the name at import
    engine.device_batch = lambda hb, **kw: hb  # already a Batch
    try:
        with pytest.raises(engine.NonFiniteLossError):
            engine.train_one_epoch(state, step, OneBatchLoader(), jax.random.key(0))
    finally:
        engine.device_batch = orig


@pytest.mark.slow
def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 produces the same loss and post-step params as the one-shot
    step (loss is a mean over rows, so averaged micro-grads == full-batch grads;
    dropout off so PRNG micro-keys are inert)."""
    cfg = tiny_cfg(dropout=0.0)
    params, _ = __import__("retr_tpu.models.caption", fromlist=["x"]).build_model(
        cfg, jax.random.key(0)
    )
    tx = tstate.make_optimizer(cfg, steps_per_epoch=100)
    batch = synth_batch(cfg, b=4)
    key = jax.random.key(1)

    s1 = tstate.TrainState(params, tx.init(params), jnp.int32(0))
    s2 = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, s1)
    step1 = tstate.make_train_step(cfg, tx, donate=False)
    step2 = tstate.make_train_step(cfg, tx, donate=False, accum_steps=2)

    out1, loss1 = step1(s1, batch, key)
    out2, loss2 = step2(s2, batch, key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_leaves_with_path(out1.params),
        jax.tree_util.tree_leaves_with_path(out2.params),
    ):
        # Adam divides by sqrt(v)+eps, amplifying micro-grad addition-order noise;
        # 1e-4/2e-6 absorbs that while still pinning the update itself.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6, err_msg=str(k1)
        )

    # cfg knob flows through the default
    step3 = tstate.make_train_step(cfg.replace(grad_accum_steps=2), tx, donate=False)
    _, loss3 = step3(jax.tree.map(lambda x: x, s1), batch, key)
    np.testing.assert_allclose(float(loss3), float(loss2), rtol=1e-6)

    with pytest.raises(ValueError, match="not divisible"):
        tstate.make_train_step(cfg, tx, donate=False, accum_steps=3)(s1, batch, key)


def test_remat_matches_plain_gradients():
    """cfg.remat (jax.checkpoint on backbone blocks + transformer layers) is a
    pure memory/FLOPs trade: loss and every gradient leaf must equal the plain
    backward's bitwise-closely (identical math, recomputed instead of saved).
    dropout on exercises PRNG-threading under remat (keys are checkpointed
    inputs, so recomputation draws the same masks)."""
    from retr_tpu.models import caption
    from retr_tpu.train.state import loss_fn

    cfg = tiny_cfg(dropout=0.1)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    batch = synth_batch(cfg, b=2, seed=5)
    key = jax.random.key(7)

    grads = {}
    losses = {}
    for name, c in (("plain", cfg), ("remat", cfg.replace(remat=True))):
        val, g = jax.jit(
            jax.value_and_grad(
                lambda p, c=c: loss_fn(p, c, batch, key, train=True)
            )
        )(params)
        losses[name], grads[name] = float(val), g
    assert losses["plain"] == pytest.approx(losses["remat"], abs=1e-6)
    flat_p = jax.tree_util.tree_leaves_with_path(grads["plain"])
    flat_r = jax.tree.leaves(grads["remat"])
    assert len(flat_p) == len(flat_r)
    for (path, gp), gr in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-6,
                                   err_msg=str(path))


def test_remat_is_train_only_for_program_keys():
    """remat never enters decode program keys (config.program_config resets it)
    but DOES distinguish train programs (_program_key keeps it) — a remat flag
    flip must not fragment the decode compile cache, and must not silently
    reuse a non-remat train executable."""
    from retr_tpu import config as config_mod

    a, b = tiny_cfg(), tiny_cfg(remat=True)
    assert config_mod.program_config(a) == config_mod.program_config(b)
    assert tstate._program_key(a) != tstate._program_key(b)


def test_build_schedule_warmup_and_cosine():
    # warmup + step: linear ramp 0 -> base over warmup_steps, then the StepLR values
    cfg = tiny_cfg(warmup_steps=5, lr_drop=2)
    s = tstate.build_schedule(cfg, 1e-4, steps_per_epoch=10)
    assert float(s(0)) == pytest.approx(1e-4 / 5)
    assert float(s(4)) == pytest.approx(1e-4)
    assert float(s(10)) == pytest.approx(1e-4)      # epoch 1, pre-drop
    assert float(s(20)) == pytest.approx(1e-5)      # epoch 2 -> one drop
    # cosine: init 0, peak at warmup end, decays to 0 at epochs*steps_per_epoch
    cfgc = tiny_cfg(lr_schedule="cosine", warmup_steps=10, epochs=3)
    c = tstate.build_schedule(cfgc, 1e-4, steps_per_epoch=10)
    assert float(c(0)) == pytest.approx(0.0, abs=1.1e-5)
    assert float(c(10)) == pytest.approx(1e-4, rel=1e-3)
    assert float(c(20)) < 1e-4
    assert float(c(30)) == pytest.approx(0.0, abs=1e-7)
    # the reference default stays the bare StepLR
    s0 = tstate.build_schedule(tiny_cfg(lr_drop=2), 1e-4, steps_per_epoch=10)
    assert float(s0(0)) == pytest.approx(1e-4)


@pytest.mark.slow
def test_cosine_warmup_train_step_runs():
    cfg = tiny_cfg(lr_schedule="cosine", warmup_steps=2)
    tx, step = cached_step(cfg)
    from retr_tpu.models import caption

    params, _ = caption.build_model(cfg, jax.random.key(0))
    state = tstate.TrainState(params, tx.init(params), jnp.int32(0))
    batch = synth_batch(cfg)
    for k in range(3):
        state, loss = step(state, batch, jax.random.key(k))
        assert np.isfinite(float(loss))


def test_async_saver_roundtrip_and_snapshot_isolation(tmp_path):
    from retr_tpu.models import caption
    from retr_tpu.train import checkpoints as ckpt

    cfg = tiny_cfg()
    params, _ = caption.build_model(cfg, jax.random.key(1))
    tx = tstate.make_optimizer(cfg, 10)
    state = tstate.TrainState(params, tx.init(params), jnp.int32(7))
    expect = jax.device_get(state.params)

    saver = ckpt.AsyncSaver()
    saver.submit(str(tmp_path / "ck"), state, cfg, epoch=3, cider_score=0.5)
    # freeing the live buffers right after submit — what the donating train step
    # does to them on the next dispatch — must not corrupt the snapshot being saved
    for leaf in jax.tree.leaves((state.params, state.opt_state)):
        leaf.delete()
    saver.wait()

    path = ckpt.latest_checkpoint(str(tmp_path / "ck"), cfg)
    assert path is not None
    meta = ckpt.read_metadata(path)
    assert meta["epoch"] == 3 and meta["cider_score"] == pytest.approx(0.5)
    assert meta["step"] == 7
    params2, _ = caption.build_model(cfg, jax.random.key(2))
    template = tstate.TrainState(params2, tx.init(params2), jnp.int32(0))
    restored, _ = ckpt.load_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # worker failures surface on wait(), not silently
    blocker = tmp_path / "plainfile"
    blocker.write_text("x")
    saver2 = ckpt.AsyncSaver()
    saver2.submit(str(blocker / "sub"), restored, cfg, epoch=0)
    with pytest.raises(OSError):
        saver2.wait()

    # ...and ALSO on the NEXT submit: a broken checkpoint path must abort at the
    # next epoch, not hours later at training exit (ADVICE r3)
    saver3 = ckpt.AsyncSaver()
    saver3.submit(str(blocker / "sub"), restored, cfg, epoch=0)
    with pytest.raises(OSError):
        saver3.submit(str(blocker / "sub2"), restored, cfg, epoch=1)

    # metadata writes are atomic: no .tmp leftovers anywhere under the ckpt dir
    import os as _os

    leftovers = [f for _, _, files in _os.walk(tmp_path / "ck")
                 for f in files if ".tmp." in f]
    assert leftovers == []
