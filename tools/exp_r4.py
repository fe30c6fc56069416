"""Round-4 perf experiments (run on the real chip; numbers land in docs/PERF.md).

Modes:
  --layer-grid-ab    greedy batch-32: LAYER_GRID single-launch whole-decoder
                     kernel vs the 18-launch split kernels, interleaved reps so
                     tunnel weather cancels, plus token equality between paths
                     (VERDICT r3 item 3).
  --launch-floor     per-launch overhead + per-kernel standalone costs: times a
                     minimal no-op-sized Pallas kernel chained N deep to get the
                     per-launch floor, then each decode-step sub-kernel (self /
                     cross / ff) in isolation under lax.scan — the quantitative
                     floor table for docs/ROOFLINE.md if the layer-grid loses.
  --train-throughput train-step A/B: f32-HIGHEST vs bf16 compute, batch 32 and
                     64, donation on (the production path), interleaved
                     (VERDICT r3 item 4).
  --frozen-prefix-ab train-step A/B: stop_gradient at the frozen layer1 output
                     (torch prunes that backward subgraph, reference
                     backbone.py:58-60) vs the full-tree backward; bf16,
                     batch 32 and 128, interleaved, losses asserted equal
                     (VERDICT r3 item 4).

Run on an idle host (no concurrent pytest).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, IMAGE, MAX_LEN = 32, 224, 128


def flagship(**kw):
    from retr_tpu.config import Config

    kw.setdefault("compute_dtype", "bfloat16")
    return Config(backbone="ResNet50", dilation=True, dropout=0.1,
                  use_pallas_decode=True, **kw)


def _median_time(fn, fetch, reps=5, rounds=3):
    dts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        for o in outs:
            fetch(o)
        dts.append((time.perf_counter() - t0) / reps)
    return float(np.median(dts))


def layer_grid_ab(reps: int = 5, rounds: int = 3):
    import jax
    import jax.numpy as jnp

    from retr_tpu import decode
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption
    from retr_tpu.ops import decoder_kernels as dk

    cfg = flagship()
    params, _ = caption.build_model(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(BATCH, 3, IMAGE, IMAGE)), jnp.float32)
    samples = Masked(img, jnp.zeros((BATCH, IMAGE, IMAGE), bool))
    kwargs = dict(max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
                  compute_dtype=jnp.dtype(cfg.compute_dtype))

    def run():
        return decode.greedy(params, cfg, samples, **kwargs)

    # compile both programs first (LAYER_GRID is read at trace time; different
    # flag -> different jaxpr -> separate executables under the same jit cache
    # key is NOT guaranteed, so clear between flips)
    results = {}
    tokens = {}
    for name, flag in (("split", False), ("layer_grid", True)):
        dk.LAYER_GRID = flag
        jax.clear_caches()
        ids = run()
        tokens[name] = np.asarray(ids)
        results[name] = []
    try:
        # interleave A/B rounds so tunnel weather cancels
        for _ in range(rounds):
            for name, flag in (("split", False), ("layer_grid", True)):
                dk.LAYER_GRID = flag
                jax.clear_caches()
                np.asarray(run())  # rebuild executable after cache clear
                t0 = time.perf_counter()
                outs = [run() for _ in range(reps)]
                for o in outs:
                    np.asarray(o)
                results[name].append((time.perf_counter() - t0) / reps)
    finally:
        dk.LAYER_GRID = False

    eq = bool(np.array_equal(tokens["split"], tokens["layer_grid"]))
    out = {"tokens_equal": eq}
    for name, dts in results.items():
        dt = float(np.median(dts))
        out[name] = {"ms_per_batch": round(dt * 1e3, 2),
                     "captions_per_sec": round(BATCH / dt, 1),
                     "ms_per_step": round(dt * 1e3 / (MAX_LEN - 1), 3)}
    print(json.dumps({"layer_grid_ab": out}, indent=2))
    return out


def launch_floor(iters: int = 512):
    """Per-launch floor + standalone per-kernel costs.

    Everything is measured under lax.scan/fori_loop with a data dependency so
    launches serialize on-device; a single scalar is fetched at the end (the
    only real barrier through the tunnel)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from retr_tpu.models import layers, transformer
    from retr_tpu.ops import decoder_kernels as dk

    cfg = flagship()
    c, h, dh = cfg.hidden_dim, cfg.nheads, cfg.head_dim
    t, s, f = MAX_LEN, 196, cfg.dim_feedforward
    key = jax.random.key(0)

    out = {}

    # -- 1. minimal kernel: [8,128] copy — pure launch overhead
    def _copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def tiny_launch(x):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    @jax.jit
    def chain_tiny(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: tiny_launch(a), x)

    x0 = jnp.zeros((8, 128), jnp.float32)
    float(chain_tiny(x0)[0, 0])  # compile
    t0 = time.perf_counter()
    float(chain_tiny(x0)[0, 0])
    per_launch_us = (time.perf_counter() - t0) / iters * 1e6
    out["tiny_kernel_us_per_launch"] = round(per_launch_us, 2)

    # -- 2. the three split kernels, standalone, chained `iters` deep
    p_ff = {
        "norm": layers.layer_norm_init(c),
        "lin1": layers.xavier_linear_init(jax.random.fold_in(key, 1), c, f),
        "lin2": layers.xavier_linear_init(jax.random.fold_in(key, 2), f, c),
    }
    p_att = {"norm": layers.layer_norm_init(c),
             "mha": layers.mha_init(jax.random.fold_in(key, 3), c)}
    xb = jax.random.normal(jax.random.fold_in(key, 4), (BATCH, c))
    qpos = jax.random.normal(jax.random.fold_in(key, 5), (c,))
    kc = jnp.zeros((h, BATCH, dh, t))
    vc = jnp.zeros((h, BATCH, dh, t))
    ck = jax.random.normal(jax.random.fold_in(key, 6), (BATCH, h, s, dh))
    cv = jax.random.normal(jax.random.fold_in(key, 7), (BATCH, h, s, dh))
    kb = jnp.zeros((BATCH, s))

    def timed_chain(name, body, x):
        @jax.jit
        def chain(x):
            return jax.lax.fori_loop(0, iters, body, x)

        float(jnp.sum(chain(x)))  # compile
        t0 = time.perf_counter()
        float(jnp.sum(chain(x)))
        us = (time.perf_counter() - t0) / iters * 1e6
        out[name] = round(us, 2)

    timed_chain("ff_block_us", lambda i, a: dk.ff_block(p_ff, a), xb)
    timed_chain(
        "cross_attn_block_us",
        lambda i, a: dk.cross_attn_block(p_att, a, qpos, ck, cv, kb, num_heads=h),
        xb,
    )

    def self_body(i, a):
        y, _, _ = dk.self_attn_block(p_att, a, qpos, kc, vc,
                                     jnp.asarray(i % t, jnp.int32), num_heads=h)
        return y

    timed_chain("self_attn_block_us", self_body, xb)

    # -- 3. the XLA pieces of a decode step: embed + final norm + head
    emb = transformer.init(jax.random.fold_in(key, 8), cfg.replace(dec_layers=1))
    from retr_tpu.models import caption as cap_mod

    params, _ = cap_mod.build_model(cfg, jax.random.fold_in(key, 9))

    def head_body(i, a):
        logits = cap_mod.mlp_head(params["mlp"], a)
        return a + jnp.argmax(logits, axis=-1)[:, None].astype(a.dtype) * 0.0

    timed_chain("mlp_head_argmax_us", head_body, xb)

    n_layers = cfg.dec_layers
    est = (n_layers * (out["self_attn_block_us"] + out["cross_attn_block_us"]
                       + out["ff_block_us"]) + out["mlp_head_argmax_us"])
    out["sum_of_parts_us_per_step"] = round(est, 1)
    out["launch_overhead_share"] = round(
        (3 * n_layers + 1) * out["tiny_kernel_us_per_launch"] / est, 3)
    print(json.dumps({"launch_floor": out}, indent=2))
    return out


def train_throughput(reps: int = 4, rounds: int = 3):
    import jax
    import jax.numpy as jnp

    from retr_tpu.models import caption
    from retr_tpu.train import state as tstate

    rng = np.random.default_rng(0)
    out = {}
    for dtype in ("float32", "bfloat16"):
        for batch in (32, 64):
            cfg = flagship(compute_dtype=dtype)
            params, _ = caption.build_model(cfg, jax.random.key(0))
            tx = tstate.make_optimizer(cfg, 100)
            state = tstate.TrainState(params, tx.init(params), jnp.int32(0))
            step_fn = tstate.make_train_step(cfg, tx)
            t_cap = cfg.max_position_embeddings + 1
            img = jnp.asarray(rng.normal(size=(batch, 3, IMAGE, IMAGE)), jnp.float32)
            caps = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, t_cap)), jnp.int32)
            tbatch = tstate.Batch(
                images=img,
                image_masks=jnp.zeros((batch, IMAGE, IMAGE), bool),
                caps=caps, cap_masks=caps == 0,
            )
            key = jax.random.key(0)

            state, loss = step_fn(state, tbatch, key)
            float(loss)
            dts = []
            for _ in range(rounds):
                t0 = time.perf_counter()
                for _ in range(reps):
                    state, loss = step_fn(state, tbatch, key)
                float(loss)
                dts.append((time.perf_counter() - t0) / reps)
            dt = float(np.median(dts))
            out[f"{dtype}_b{batch}"] = {"step_ms": round(dt * 1e3, 1),
                                        "samples_per_sec": round(batch / dt, 1),
                                        "loss_finite": bool(np.isfinite(float(loss)))}
            del state, params
    print(json.dumps({"train_throughput": out}, indent=2))
    return out


def loss_ab(reps: int = 4, rounds: int = 3, batch: int = 32):
    """Interleaved A/B of the two cross-entropy forms inside the full train step
    (tstate.CE_IMPL): fused logsumexp+masked-reduction vs log_softmax+gather."""
    import jax
    import jax.numpy as jnp

    from retr_tpu.models import caption
    from retr_tpu.train import state as tstate

    rng = np.random.default_rng(0)
    cfg = flagship()
    params, _ = caption.build_model(cfg, jax.random.key(0))
    tx = tstate.make_optimizer(cfg, 100)
    t_cap = cfg.max_position_embeddings + 1
    img = jnp.asarray(rng.normal(size=(batch, 3, IMAGE, IMAGE)), jnp.float32)
    caps = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, t_cap)), jnp.int32)
    tbatch = tstate.Batch(images=img, image_masks=jnp.zeros((batch, IMAGE, IMAGE), bool),
                          caps=caps, cap_masks=caps == 0)
    key = jax.random.key(0)

    steps, states, losses = {}, {}, {}
    for impl in ("fused", "logsoftmax"):
        tstate.CE_IMPL = impl
        # donate=False: both variants share the same initial params tree
        steps[impl] = tstate.make_train_step(cfg, tx, donate=False)
        states[impl] = tstate.TrainState(params, tx.init(params), jnp.int32(0))
        states[impl], l0 = steps[impl](states[impl], tbatch, key)  # compile
        losses[impl] = float(l0)
    out = {impl: [] for impl in steps}
    for _ in range(rounds):
        for impl in ("fused", "logsoftmax"):
            tstate.CE_IMPL = impl
            st = states[impl]
            t0 = time.perf_counter()
            for _ in range(reps):
                st, loss = steps[impl](st, tbatch, key)
            float(loss)
            out[impl].append((time.perf_counter() - t0) / reps)
            states[impl] = st
    tstate.CE_IMPL = "fused"
    res = {impl: {"step_ms": round(float(np.median(v)) * 1e3, 1),
                  "samples_per_sec": round(batch / float(np.median(v)), 1),
                  "first_step_loss": losses[impl]} for impl, v in out.items()}
    res["loss_abs_diff_step1"] = abs(losses["fused"] - losses["logsoftmax"])
    print(json.dumps({"loss_ab": res}, indent=2))
    return res


def frozen_prefix_ab(reps: int = 4, rounds: int = 3, batches=(32, 128)):
    """Interleaved A/B of the frozen-prefix backward prune (stop_gradient at the
    layer1 output — torch never backprops through requires_grad=False
    conv1/bn1/layer1, reference backbone.py:58-60) vs the full-tree backward.

    Forward values are identical and frozen grads are optimizer-zeroed either
    way, so the step losses must match exactly — asserted per batch size."""
    import jax
    import jax.numpy as jnp

    from retr_tpu.models import caption, resnet
    from retr_tpu.train import state as tstate

    import optax

    orig_apply = resnet.apply
    orig_zero_frozen = tstate._zero_frozen_grads

    def apply_no_stop(params, x, **kw):
        kw["stop_prefix_gradient"] = False
        return orig_apply(params, x, **kw)

    def patch(name):
        # "full" reproduces the round-3 step exactly: no stop_gradient AND no
        # pre-clip frozen-grad zeroing (which alone would let XLA DCE the
        # frozen backward and understate the delta)
        resnet.apply = orig_apply if name == "pruned" else apply_no_stop
        tstate._zero_frozen_grads = (
            orig_zero_frozen if name == "pruned" else optax.identity
        )

    rng = np.random.default_rng(0)
    cfg = flagship()
    out = {}
    for batch in batches:
        params, _ = caption.build_model(cfg, jax.random.key(0))
        t_cap = cfg.max_position_embeddings + 1
        img = jnp.asarray(rng.normal(size=(batch, 3, IMAGE, IMAGE)), jnp.float32)
        caps = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, t_cap)), jnp.int32)
        tbatch = tstate.Batch(images=img,
                              image_masks=jnp.zeros((batch, IMAGE, IMAGE), bool),
                              caps=caps, cap_masks=caps == 0)
        key = jax.random.key(0)

        steps, states, losses = {}, {}, {}
        for name in ("pruned", "full"):
            patch(name)
            # memo=False: this A/B monkeypatches tstate/resnet internals, so the
            # process-level step/optimizer caches must not serve stale programs
            tx = tstate.make_optimizer(cfg, 100, memo=False)
            steps[name] = tstate.make_train_step(cfg, tx, donate=False, memo=False)
            states[name] = tstate.TrainState(params, tx.init(params), jnp.int32(0))
            states[name], l0 = steps[name](states[name], tbatch, key)  # traces here
            losses[name] = float(l0)
        resnet.apply = orig_apply
        tstate._zero_frozen_grads = orig_zero_frozen
        dts = {name: [] for name in steps}
        for _ in range(rounds):
            for name in ("pruned", "full"):
                st = states[name]
                t0 = time.perf_counter()
                for _ in range(reps):
                    st, loss = steps[name](st, tbatch, key)
                float(loss)
                dts[name].append((time.perf_counter() - t0) / reps)
                states[name] = st
        row = {name: {"step_ms": round(float(np.median(v)) * 1e3, 1),
                      "samples_per_sec": round(batch / float(np.median(v)), 1)}
               for name, v in dts.items()}
        row["loss_abs_diff_step1"] = abs(losses["pruned"] - losses["full"])
        out[f"b{batch}"] = row
        del steps, states

    # pruned-only batch-256 scaling row (donation on = the production path);
    # guarded: a full-backward 256 was never measured and may not fit
    try:
        batch = 256
        params, _ = caption.build_model(cfg, jax.random.key(0))
        tx = tstate.make_optimizer(cfg, 100)
        t_cap = cfg.max_position_embeddings + 1
        img = jnp.asarray(rng.normal(size=(batch, 3, IMAGE, IMAGE)), jnp.float32)
        caps = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, t_cap)), jnp.int32)
        tbatch = tstate.Batch(images=img,
                              image_masks=jnp.zeros((batch, IMAGE, IMAGE), bool),
                              caps=caps, cap_masks=caps == 0)
        step = tstate.make_train_step(cfg, tx)
        state = tstate.TrainState(params, tx.init(params), jnp.int32(0))
        state, loss = step(state, tbatch, jax.random.key(0))
        float(loss)
        dts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, loss = step(state, tbatch, jax.random.key(0))
            float(loss)
            dts.append((time.perf_counter() - t0) / reps)
        dt = float(np.median(dts))
        out["b256_pruned_only"] = {"step_ms": round(dt * 1e3, 1),
                                   "samples_per_sec": round(batch / dt, 1),
                                   "loss_finite": bool(np.isfinite(float(loss)))}
    except Exception as e:  # noqa: BLE001 — record instead of dying
        out["b256_pruned_only"] = {"error": repr(e)[:300]}

    print(json.dumps({"frozen_prefix_ab": out}, indent=2))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer-grid-ab", action="store_true")
    ap.add_argument("--launch-floor", action="store_true")
    ap.add_argument("--train-throughput", action="store_true")
    ap.add_argument("--loss-ab", action="store_true")
    ap.add_argument("--frozen-prefix-ab", action="store_true")
    args = ap.parse_args()
    if args.layer_grid_ab:
        layer_grid_ab()
    if args.launch_floor:
        launch_floor()
    if args.train_throughput:
        train_throughput()
    if args.loss_ab:
        loss_ab()
    if args.frozen_prefix_ab:
        frozen_prefix_ab()
