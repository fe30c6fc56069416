"""Serving benchmark: ServingQueue under open-loop Poisson load -> latency percentiles.

The north-star metric (BASELINE.md) is "expressions/sec/chip; p50 latency per
caption". bench.py / bench_full.py measure batch throughput; this tool measures the
SERVING view: concurrent single-request callers hitting the async micro-batcher
(predictor.ServingQueue), which coalesces them into padded device batches. Arrivals
are open-loop Poisson (exponential interarrival, seeded), so queueing delay is
measured honestly — a closed loop would self-throttle and hide it.

Per offered rate it reports: achieved throughput, p50/p95/p99 end-to-end latency
(submit -> decoded string), and mean dispatch batch size. Mirrors the inference
path a reference user would serve (/root/reference/eval_utils/decode.py:30-50
greedy_single is their only single-request surface — one full model rerun per token).

Usage:
  python tools/bench_serving.py [--rates 20 50 100] [--requests 200]
      [--max-batch 32] [--max-wait-s 0.01] [--ckpt DIR] [--dtype bfloat16]
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

from bench_e2e import make_fixture  # noqa: E402  (same synthetic JPEG fixture)


def run_load(queue, paths, bboxes, rate: float, n_requests: int, seed: int = 0):
    """Open-loop: submit n_requests at Poisson arrivals of `rate`/s; return
    (latencies_of_accepted, wall, n_rejected). Rejected submits (admission
    control, predictor.ServingOverloaded) are counted, not retried — the
    open-loop pace is preserved either way."""
    from retr_tpu.predictor import ServingOverloaded

    rng = np.random.default_rng(seed)
    inter = rng.exponential(1.0 / rate, size=n_requests)
    lat: list = []
    lat_lock = __import__("threading").Lock()

    def make_cb(t_sub):
        def cb(fut):
            dt = time.monotonic() - t_sub
            with lat_lock:
                lat.append(dt)
        return cb

    t0 = time.monotonic()
    next_t = t0
    futs = []
    rejected = 0
    for i in range(n_requests):
        next_t += inter[i]
        delay = next_t - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        t_sub = time.monotonic()
        try:
            f = queue.submit(paths[i % len(paths)], bboxes[i % len(bboxes)])
        except ServingOverloaded:
            rejected += 1
            continue
        f.add_done_callback(make_cb(t_sub))
        futs.append(f)
    for f in futs:
        f.result(timeout=600)
    wall = time.monotonic() - t0
    return np.asarray(lat, np.float64), wall, rejected


def run_soak(queue, paths, bboxes, rate: float, duration_s: float,
             sample_every_s: float = 1.0, seed: int = 0):
    """Sustained-overload soak: open-loop submission at `rate` req/s for
    `duration_s`, with a monitor thread sampling queue depth + completion counts.
    After the window, close() is called WITH the backlog still standing and the
    drain is asserted graceful: every accepted future reaches a terminal state.
    Submits shed by admission control (ServingOverloaded) are counted — under
    sustained overload the steady state is: bounded queue, bounded p99 for the
    ACCEPTED requests, everything beyond capacity rejected at the door.

    Returns (series, latencies, summary).
    """
    import threading

    from retr_tpu.predictor import ServingOverloaded

    rng = np.random.default_rng(seed)
    lats: list = []
    lat_lock = threading.Lock()
    futs = []
    done_count = [0]
    rejected = [0]
    offered = [0]

    def make_cb(t_sub):
        def cb(fut):
            dt = time.monotonic() - t_sub
            with lat_lock:
                lats.append(dt)
                done_count[0] += 1
        return cb

    series = []
    stop_monitor = threading.Event()
    t0 = time.monotonic()

    def monitor():
        while not stop_monitor.wait(sample_every_s):
            series.append({
                "t_s": round(time.monotonic() - t0, 1),
                "queue_depth": queue._q.qsize(),
                "offered": offered[0],
                "accepted": len(futs),
                "rejected": rejected[0],
                "completed": done_count[0],
            })

    mon = threading.Thread(target=monitor, daemon=True)
    mon.start()

    next_t = t0
    while True:
        now = time.monotonic()
        if now - t0 >= duration_s:
            break
        next_t += rng.exponential(1.0 / rate)
        delay = next_t - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        i = offered[0]
        offered[0] += 1
        t_sub = time.monotonic()
        try:
            f = queue.submit(paths[i % len(paths)], bboxes[i % len(bboxes)])
        except ServingOverloaded:
            rejected[0] += 1
            continue
        f.add_done_callback(make_cb(t_sub))
        futs.append(f)

    backlog_at_close = queue._q.qsize()
    t_close = time.monotonic()
    queue.close(wait=True)  # graceful drain: processes the whole standing backlog
    drain_s = time.monotonic() - t_close
    stop_monitor.set()
    mon.join()

    unresolved = sum(1 for f in futs if not f.done())
    errors = sum(1 for f in futs if f.done() and f.exception() is not None)
    summary = {
        "offered_rate_rps": rate,
        "duration_s": duration_s,
        "offered": offered[0],
        "accepted": len(futs),
        "rejected": rejected[0],
        "completed_ok": len(futs) - errors - unresolved,
        "errors": errors,
        "unresolved_futures": unresolved,  # MUST be 0: the drain assertion
        "backlog_at_close": backlog_at_close,
        "drain_s": round(drain_s, 1),
        "achieved_rps_incl_drain": round(len(lats) / (t_close - t0 + drain_s), 2),
        "admission": queue.stats(),
    }
    assert unresolved == 0, f"{unresolved} futures never resolved after close()"
    return series, np.asarray(lats, np.float64), summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", type=float, nargs="+", default=[20.0, 50.0, 100.0],
                    help="offered request rates (req/s), measured one after another")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-wait-s", type=float, default=0.05,
                    help="batching window; 50 ms measured better on both axes "
                    "than 10 ms at load (docs/PERF.md)")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="ServingQueue batches in flight")
    ap.add_argument("--fixture-dir", default="/tmp/retr_e2e_fixture")
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--backbone", default="ResNet50")
    ap.add_argument("--decoder", default="greedy", choices=["greedy", "beam", "sample"])
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"],
                    help="validated-fastest mode by default (docs/AB_BF16.json)")
    ap.add_argument("--ckpt", default="", help="retr_tpu checkpoint dir; without it "
                    "random weights decode the full 127 steps (worst case)")
    ap.add_argument("--soak", type=float, default=0.0, metavar="SECONDS",
                    help="run ONE sustained-overload soak of this duration instead "
                    "of the rate sweep; asserts a graceful close() drain under load")
    ap.add_argument("--soak-rate", type=float, default=400.0,
                    help="offered rate for --soak (default 400 req/s ≈ 3x capacity)")
    ap.add_argument("--ab-max-batch", type=int, nargs="+", default=[],
                    help="A/B max_batch values under one overload rate, rounds "
                    "INTERLEAVED in one process (tunnel round-trip cost varies "
                    ">2x across hours — docs/ROADMAP.md — so never compare "
                    "serving numbers from separate runs)")
    ap.add_argument("--ab-rounds", type=int, default=3)
    args = ap.parse_args()

    coco_dir, _ = make_fixture(args.fixture_dir, args.images)
    img_dir = os.path.join(coco_dir, "train2014")
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))[: args.images]
    rng = np.random.default_rng(1)
    bboxes = [[float(rng.uniform(2, 80)), float(rng.uniform(2, 80)),
               float(rng.uniform(40, 160)), float(rng.uniform(40, 160))]
              for _ in paths]

    import jax

    from retr_tpu.config import Config
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.models import caption
    from retr_tpu.predictor import Predictor, ServingQueue

    tok, _, _ = prepare_tokenizer()
    if args.ckpt:
        import jax.numpy as jnp

        from retr_tpu.train import checkpoints as ckpt_mod
        from retr_tpu.train.state import TrainState, make_optimizer

        cfg = ckpt_mod.config_from_checkpoint(args.ckpt).replace(
            compute_dtype=args.dtype, use_pallas_decode=True)
        template_params, _ = caption.build_model(cfg, jax.random.key(0))
        tx = make_optimizer(cfg, steps_per_epoch=1)
        state, _ = ckpt_mod.load_checkpoint(
            args.ckpt, TrainState(template_params, tx.init(template_params), jnp.int32(0)))
        params = state.params
    else:
        cfg = Config(backbone=args.backbone, dilation=True, dropout=0.1,
                     use_pallas_decode=True, compute_dtype=args.dtype,
                     vocab_size=tok.vocab_size)
        params, _ = caption.build_model(cfg, jax.random.key(0))

    if args.ab_max_batch:
        # one queue per max_batch (each its own padded-shape compile), rounds
        # interleaved so every variant sees the same tunnel weather
        queues = {}
        for mb in args.ab_max_batch:
            p = Predictor(params, cfg, tok, max_batch=mb)
            q = ServingQueue(p, max_wait_s=args.max_wait_s, decoder=args.decoder,
                             pipeline_depth=args.pipeline_depth)
            p.predict_batch([paths[0]] * 2, bboxes[:2], decoder=args.decoder)  # compile
            queues[mb] = q
        cells = []
        for r in range(args.ab_rounds):
            for mb, q in queues.items():
                lat, wall, rej = run_load(q, paths, bboxes, args.soak_rate,
                                          args.requests, seed=r)
                cells.append({"max_batch": mb, "round": r,
                              "achieved_rps": round(len(lat) / wall, 2),
                              "rejected": rej,
                              "p50_latency_s": round(float(np.percentile(lat, 50)), 4),
                              "p99_latency_s": round(float(np.percentile(lat, 99)), 4)})
                print(json.dumps(cells[-1]), flush=True)
        for q in queues.values():
            q.close()
        summary = {
            mb: {
                "achieved_rps_median": float(np.median(
                    [c["achieved_rps"] for c in cells if c["max_batch"] == mb])),
                "p50_latency_s_median": float(np.median(
                    [c["p50_latency_s"] for c in cells if c["max_batch"] == mb])),
            }
            for mb in args.ab_max_batch
        }
        print(json.dumps({
            "metric": f"ServingQueue max_batch A/B {args.decoder} ({args.dtype}, "
                      f"wait {args.max_wait_s * 1e3:.0f} ms, depth "
                      f"{args.pipeline_depth}, overload {args.soak_rate} req/s)",
            "requests_per_cell": args.requests,
            "device": str(jax.devices()[0]),
            "cells": cells, "summary": summary,
        }))
        return

    pred = Predictor(params, cfg, tok, max_batch=args.max_batch)
    queue = ServingQueue(pred, max_wait_s=args.max_wait_s, decoder=args.decoder,
                         pipeline_depth=args.pipeline_depth)

    # warmup: compile the single padded program shape + warm the host path
    pred.predict_batch([paths[0]] * 2, bboxes[:2], decoder=args.decoder)

    if args.soak:
        series, lat, summary = run_soak(queue, paths, bboxes, args.soak_rate,
                                        args.soak)
        out = {
            "metric": f"ServingQueue SOAK {args.decoder} ({args.dtype}, max_batch "
                      f"{args.max_batch}, wait {args.max_wait_s * 1e3:.0f} ms, "
                      f"depth {args.pipeline_depth})",
            "summary": summary,
            "p50_latency_s": round(float(np.percentile(lat, 50)), 3),
            "p99_latency_s": round(float(np.percentile(lat, 99)), 3),
            "queue_depth_series": series,
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(out))
        return

    results = []
    for rate in args.rates:
        lat, wall, rej = run_load(queue, paths, bboxes, rate, args.requests)
        results.append({
            "offered_rate_rps": rate,
            "achieved_rps": round(len(lat) / wall, 2),
            "rejected": rej,
            "p50_latency_s": round(float(np.percentile(lat, 50)), 4),
            "p95_latency_s": round(float(np.percentile(lat, 95)), 4),
            "p99_latency_s": round(float(np.percentile(lat, 99)), 4),
            "mean_latency_s": round(float(lat.mean()), 4),
        })
    queue.close()

    out = {
        "metric": f"ServingQueue {args.decoder} ({args.dtype}, max_batch "
                  f"{args.max_batch}, wait {args.max_wait_s * 1e3:.0f} ms, "
                  f"depth {args.pipeline_depth}, "
                  f"{'trained ckpt' if args.ckpt else 'random weights/full 127 steps'})",
        "requests_per_rate": args.requests,
        "device": str(jax.devices()[0]),
        "loads": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
