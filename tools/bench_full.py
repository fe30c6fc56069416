"""Full benchmark matrix: all five BASELINE.md configs, measured on the real chip.

Writes BENCH_DETAILS.json. Slower than bench.py (several compiles through the
device transport) — bench.py stays the quick single-line headline.

  1. single-image greedy latency (eval_model.py single-sample path)
  2. batch-32 greedy throughput with static padding (the bench.py headline)
  3. beam search k=5 with length normalization (north-star extension)
  4. ConcatTransformer dual-stream target+context fusion (CaptionGlobalLoc)
  5. eval-sweep path: dp-mesh sharded batched greedy (1 chip here; the same jit
     partitions over a v5e-4 mesh — multi-chip validated on the virtual CPU mesh
     in tests/test_sweep.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, IMAGE, MAX_LEN, flagship_cfg, measure_torch_baseline  # noqa: E402


def _timed(fn, reps=3):
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from retr_tpu import decode
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption

    results = {}
    cfg = flagship_cfg()
    params, _ = caption.build_model(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    kwargs = dict(max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
                  compute_dtype=jnp.dtype(cfg.compute_dtype))

    def samples_of(b):
        img = jnp.asarray(rng.normal(size=(b, 3, IMAGE, IMAGE)), jnp.float32)
        return Masked(img, jnp.zeros((b, IMAGE, IMAGE), dtype=bool))

    # 1: single image latency
    s1 = samples_of(1)
    t = _timed(lambda: decode.greedy(params, cfg, s1, **kwargs))
    results["1_single_image_greedy"] = {"latency_s": t, "captions_per_sec": 1.0 / t}

    # 2: batch-32 greedy
    s32 = samples_of(BATCH)
    t = _timed(lambda: decode.greedy(params, cfg, s32, **kwargs))
    results["2_batch32_greedy"] = {
        "latency_s_per_batch": t,
        "captions_per_sec": BATCH / t,
    }

    # 3: beam search k=5
    t = _timed(lambda: decode.beam_search(params, cfg, s32, beam_size=5,
                                          length_penalty=1.0, **kwargs)[0])
    results["3_beam5_batch32"] = {
        "latency_s_per_batch": t,
        "captions_per_sec": BATCH / t,
    }

    # 4: ConcatTransformer dual-stream (target + 5 loc tokens + context stream)
    cfg_gl = cfg.replace(use_global_features=True, use_location_features=True)
    params_gl, _ = caption.build_model(cfg_gl, jax.random.key(1))
    loc = jnp.asarray(rng.random((BATCH, 5)), jnp.float32)
    g32 = samples_of(BATCH)
    t = _timed(lambda: decode.greedy(params_gl, cfg_gl, s32, global_samples=g32,
                                     loc_feats=loc, **kwargs))
    results["4_dual_stream_greedy"] = {
        "latency_s_per_batch": t,
        "captions_per_sec": BATCH / t,
    }

    # 5: sweep path on a 1-chip dp mesh (the multi-chip program, n=1 here)
    from retr_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(dp=len(jax.devices()), mp=1)
    from retr_tpu.parallel.sweep import shard_batch

    sh = Masked(*shard_batch(tuple(s32), mesh))
    p_rep = jax.device_put(params, pmesh.replicated(mesh))
    t = _timed(lambda: decode.greedy(p_rep, cfg, sh, **kwargs))
    results["5_sweep_dp_mesh"] = {
        "devices": len(jax.devices()),
        "latency_s_per_batch": t,
        "captions_per_sec": BATCH / t,
    }

    # 6 (extra): training-step throughput, batch 32, full flagship model
    from retr_tpu.train import state as tstate

    tx = tstate.make_optimizer(cfg, steps_per_epoch=1000)
    # the DONATING step, exactly as main.py runs it — donate=False measures a
    # step that copies the whole opt state and reads ~28% slower (r4 measured
    # 90 ms vs 65 ms at batch 32); thread the state through chained steps and
    # fetch one loss at the end (the only real barrier through the tunnel).
    # The donated state gets its OWN params copy: donation frees the input
    # buffers, and sections 7/10/11 below still decode with `params`.
    params_t = jax.tree.map(jnp.copy, params)
    state = tstate.TrainState(params_t, tx.init(params_t), jax.numpy.int32(0))
    step = tstate.make_train_step(cfg, tx)
    t_cap = cfg.max_position_embeddings + 1
    caps = jnp.asarray(rng.integers(1, cfg.vocab_size, (BATCH, t_cap)), jnp.int32)
    batch = tstate.Batch(
        images=jnp.asarray(rng.normal(size=(BATCH, 3, IMAGE, IMAGE)), jnp.float32),
        image_masks=jnp.zeros((BATCH, IMAGE, IMAGE), dtype=bool),
        caps=caps, cap_masks=caps == 0,
    )
    key = jax.random.key(0)
    s2, loss = step(state, batch, key)
    np.asarray(loss)
    n_chain = 10
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_chain):
            s2, loss_c = step(s2, batch, key)
        np.asarray(loss_c)
        ts.append((time.perf_counter() - t0) / n_chain)
    t = float(np.median(ts))
    results["6_train_step_batch32"] = {
        "step_s": t,
        "samples_per_sec": BATCH / t,
        "loss_finite": bool(np.isfinite(float(loss))),
        "note": "donating step threaded state->state, single loss fetch per round",
    }
    del s2, state, params_t

    # 12 (extra, r5): LARGE-batch train rows (VERDICT r4 item 4) — batch 256
    # plain, and batch 320 under cfg.remat (the largest that compiles at all;
    # the plain 320 step fails in the remote compiler, tools/exp_r5.py
    # --remat-ab, and remat is the sanctioned escape hatch past it).
    for b_tr, use_remat in ((256, False), (320, True)):
        cfg_tr = cfg.replace(remat=use_remat)
        try:
            params_tr = jax.tree.map(jnp.copy, params)
            st = tstate.TrainState(params_tr, tx.init(params_tr), jax.numpy.int32(0))
            step_tr = tstate.make_train_step(cfg_tr, tx)
            caps_tr = jnp.asarray(
                rng.integers(1, cfg.vocab_size, (b_tr, t_cap)), jnp.int32)
            batch_tr = tstate.Batch(
                images=jnp.asarray(rng.normal(size=(b_tr, 3, IMAGE, IMAGE)),
                                   jnp.float32),
                image_masks=jnp.zeros((b_tr, IMAGE, IMAGE), dtype=bool),
                caps=caps_tr, cap_masks=caps_tr == 0,
            )
            st, loss_tr = step_tr(st, batch_tr, key)
            np.asarray(loss_tr)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    st, loss_tr = step_tr(st, batch_tr, key)
                np.asarray(loss_tr)
                ts.append((time.perf_counter() - t0) / 5)
            t = float(np.median(ts))
            results[f"12_train_step_batch{b_tr}" + ("_remat" if use_remat else "")] = {
                "step_s": t,
                "samples_per_sec": b_tr / t,
                "remat": use_remat,
                "loss_finite": bool(np.isfinite(float(loss_tr))),
            }
            del st, params_tr, batch_tr
        except Exception as e:  # noqa: BLE001 — the ceiling is the finding
            results[f"12_train_step_batch{b_tr}" + ("_remat" if use_remat else "")] = {
                "remat": use_remat, "error": f"{type(e).__name__}: {e}"[:200]}

    # 7 (extra): batch-128 greedy — eval throughput scales with batch (PERF.md)
    s128 = samples_of(128)
    t = _timed(lambda: decode.greedy(params, cfg, s128, **kwargs))
    results["7_batch128_greedy"] = {
        "latency_s_per_batch": t,
        "captions_per_sec": 128 / t,
    }

    # 10 (extra): batch-256 greedy — the round-3 headline (continuity row; the
    # r4 true-bf16 decode loop moved the curve plateau to 512, now bench.py's
    # headline).
    s256 = samples_of(256)
    t = _timed(lambda: decode.greedy(params, cfg, s256, **kwargs))
    results["10_batch256_greedy"] = {
        "latency_s_per_batch": t,
        "captions_per_sec": 256 / t,
    }

    # 11 (extra, r4): batches beyond 256 — the ff-block is now gridded over batch
    # blocks (ops/decoder_kernels.py::_ff_batch_block), so the framework no
    # longer caps batch size; record where the HARDWARE curve actually turns.
    for b_big in (384, 512):
        try:
            s_big = samples_of(b_big)
            t = _timed(lambda: decode.greedy(params, cfg, s_big, **kwargs))
            results[f"11_batch{b_big}_greedy"] = {
                "latency_s_per_batch": t,
                "captions_per_sec": b_big / t,
            }
        except Exception as e:  # noqa: BLE001 — record the ceiling, don't die
            results[f"11_batch{b_big}_greedy"] = {"error": f"{type(e).__name__}: {e}"}

    # 9 (extra): stochastic sampling decoder, batch 32 (temperature 1, top-k 50) —
    # the extension's cost vs greedy (same KV-cached loop + filter/categorical)
    t = _timed(lambda: decode.sample(params, cfg, s32, jax.random.key(3),
                                     temperature=1.0, top_k=50, **kwargs))
    results["9_sample_topk50_batch32"] = {
        "latency_s_per_batch": t,
        "captions_per_sec": BATCH / t,
    }

    # 8 (extra): the REAL training epoch loop (host batches + device_batch upload +
    # pipelined loss drain) — what a user's samples/s actually is, vs the raw step
    # of config 6.
    import time as _time

    from retr_tpu import engine
    from retr_tpu.data.dataset import HostBatch

    hb = HostBatch(
        ann_ids=np.arange(BATCH),
        target_images=rng.integers(0, 256, (BATCH, IMAGE, IMAGE, 3), dtype=np.uint8),
        target_masks=np.zeros((BATCH, IMAGE, IMAGE), bool),
        caps=np.asarray(rng.integers(1, cfg.vocab_size, (BATCH, t_cap)), np.int32),
        cap_masks=np.zeros((BATCH, t_cap), bool),
    )
    step_d = tstate.make_train_step(cfg, tx)  # donating step, as main.py uses
    state8 = tstate.TrainState(params, tx.init(params), jax.numpy.int32(0))
    state8, _ = engine.train_one_epoch(state8, step_d, [hb] * 3, jax.random.key(1))
    n_steps = 10
    t0 = _time.perf_counter()
    state8, loss8 = engine.train_one_epoch(
        state8, step_d, [hb] * n_steps, jax.random.key(1)
    )
    dt = (_time.perf_counter() - t0) / n_steps
    results["8_train_epoch_loop_batch32"] = {
        "step_s": dt,
        "samples_per_sec": BATCH / dt,
        "loss_finite": bool(np.isfinite(loss8)),
    }

    results["reference_cpu_baseline_captions_per_sec"] = measure_torch_baseline()
    results["compute_dtype"] = cfg.compute_dtype
    results["device"] = str(jax.devices()[0])

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "BENCH_DETAILS.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
