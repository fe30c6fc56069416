"""End-to-end eval benchmark INCLUDING the host input pipeline (VERDICT r1 item 2).

Runs the real ``engine.eval_model`` loop — loader (JPEG decode -> crop -> native
pad+resize, threaded prefetch) -> device_batch -> KV-cached decode -> prune ->
NLG scoring — on a synthetic on-disk RefCOCO dataset with realistic image sizes
(300-640 px), and reports captions/s end-to-end plus the phase breakdown the
north-star metric needs (mirrors /root/reference/engine.py:125-186, which is the
path a reference user actually runs).

The fixture is cached under --fixture-dir (default /tmp/retr_e2e_fixture) so
repeat runs skip generation.

Usage: python tools/bench_e2e.py [--images 96] [--batch 32] [--device axon]
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

CAPTIONS = [
    "the red dog on the left side",
    "a small cat next to the wooden chair",
    "the man wearing a blue shirt and hat",
    "the big green car in front of the store",
    "a woman sitting on the right bench",
    "the black hat on the round table",
    "the tall lamp behind the sofa",
    "a brown horse near the fence",
]


def make_fixture(root: str, n_images: int, seed: int = 0):
    """Synthetic RefCOCO at realistic image sizes; every ann is its own image
    (worst case for decode-cache reuse). Cached across runs; the whole fixture
    lives under a per-n_images subdir so different sizes never clobber each
    other's annotation files (a shared dir once left 96-image runs scoring a
    32-ann instances.json)."""
    import pickle

    from PIL import Image

    base = os.path.join(root, f"n{n_images}")
    coco_dir = os.path.join(base, "coco")
    ref_dir = os.path.join(base, "refs", "refcoco")
    stamp = os.path.join(base, f"ok_{n_images}")
    if os.path.exists(stamp):
        return coco_dir, ref_dir
    os.makedirs(os.path.join(coco_dir, "train2014"), exist_ok=True)
    os.makedirs(ref_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    annotations, refs = [], []
    for i in range(n_images):
        image_id = 2000 + i
        h, w = int(rng.integers(300, 640)), int(rng.integers(300, 640))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(coco_dir, "train2014", f"COCO_train2014_{image_id:012d}.jpg"),
            quality=90,
        )
        x, y = float(rng.uniform(2, w * 0.4)), float(rng.uniform(2, h * 0.4))
        bw, bh = float(rng.uniform(40, w * 0.5)), float(rng.uniform(40, h * 0.5))
        annotations.append({"id": i, "image_id": image_id, "bbox": [x, y, bw, bh],
                            "category_id": 1})
        sents = [{"sent_id": 2 * i + j, "sent": CAPTIONS[(2 * i + j) % len(CAPTIONS)]}
                 for j in range(2)]
        refs.append({"ann_id": i, "ref_id": i, "image_id": image_id, "split": "val",
                     "file_name": f"x_{i}.jpg", "sentences": sents})
    with open(os.path.join(ref_dir, "instances.json"), "w") as f:
        json.dump({"annotations": annotations}, f)
    with open(os.path.join(ref_dir, "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)
    open(stamp, "w").close()
    return coco_dir, ref_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--fixture-dir", default="/tmp/retr_e2e_fixture")
    ap.add_argument("--backbone", default="ResNet50")
    ap.add_argument("--decoder", default="greedy", choices=["greedy", "beam"])
    ap.add_argument("--ckpt", default="", help="retr_tpu checkpoint dir (e.g. the "
                    "tools/ab_bf16.py memorization checkpoint) — realistic short "
                    "hypotheses instead of random-weight garbage")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="compute_dtype for the eval decode; bfloat16 is the "
                    "validated-fastest benchmark mode (docs/AB_BF16.json)")
    ap.add_argument("--depth", type=int, default=2,
                    help="eval_model pipeline_depth (batches in flight)")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed epochs; reports the median (the tunnel's "
                    "per-batch round trip varies 2x across minutes)")
    ap.add_argument("--emit-json", default="",
                    help="write the per-batch phase breakdown artifact here "
                    "(docs/E2E.json — VERDICT r4 item 5): host_wait / upload "
                    "dispatch / decode dispatch / fetch per batch, score time, "
                    "a null-round-trip transport-weather probe, and a device-"
                    "only decode estimate")
    args = ap.parse_args()

    coco_dir, ref_dir = make_fixture(args.fixture_dir, args.images)

    import jax

    from retr_tpu import engine
    from retr_tpu.config import Config
    from retr_tpu.data import dataset as ds
    from retr_tpu.data.tokenizer import prepare_tokenizer
    from retr_tpu.models import caption
    from retr_tpu.utils.profiling import PhaseTimer

    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        dir=coco_dir, ref_dir=ref_dir, verbose=False, backbone=args.backbone,
        dilation=True, dropout=0.1, batch_size=args.batch, num_workers=args.workers,
        use_pallas_decode=True, compute_dtype=args.dtype,
        **({"vocab_size": tok.vocab_size} if args.ckpt else {}),
    )
    if args.ckpt:
        import jax.numpy as jnp

        from retr_tpu.train import checkpoints as ckpt_mod
        from retr_tpu.train.state import TrainState, make_optimizer

        template_params, _ = caption.build_model(cfg, jax.random.key(0))
        tx = make_optimizer(cfg, steps_per_epoch=1)
        template = TrainState(template_params, tx.init(template_params), jnp.int32(0))
        state, _ = ckpt_mod.load_checkpoint(args.ckpt, template)
        params = state.params
    else:
        params, _ = caption.build_model(cfg, jax.random.key(0))
    dataset = ds.build_dataset(cfg, "val", tokenizer=tok, return_unique=True)
    loader = ds.DataLoader(dataset, cfg.batch_size, num_workers=cfg.num_workers)

    # warmup epoch: compile decode + device pipeline, warm the page cache
    engine.eval_model(params, cfg, loader, tok, decoder=args.decoder,
                      pipeline_depth=args.depth)

    runs = []
    for _ in range(max(args.reps, 1)):
        timer = PhaseTimer()
        t0 = time.perf_counter()
        with timer.phase("eval_total"):
            metrics, hyps = engine.eval_model(
                params, cfg, loader, tok, decoder=args.decoder, timer=timer,
                pipeline_depth=args.depth,
            )
        runs.append((time.perf_counter() - t0, timer, metrics, hyps))
    runs.sort(key=lambda r: r[0])
    wall, timer, metrics, hyps = runs[len(runs) // 2]  # median epoch
    n = len(hyps)

    s = timer.summary()
    phases = {k: round(v["total_s"], 3) for k, v in s.items()}
    loop = sum(s[k]["total_s"] for k in ("input", "decode", "fetch") if k in s)
    out = {
        "metric": f"end-to-end eval_model ({args.decoder}, batch {args.batch}, "
                  f"{args.dtype}, host JPEG->crop->resize included): captions/s",
        "value": round(n / wall, 2),
        "unit": "captions/s",
        "n_captions": n,
        "wall_s": round(wall, 3),
        "phases_s": phases,
        "overlap_note": (
            "input phase = time device_batch blocks the eval loop; loader prefetch "
            "threads overlap the NEXT batch's JPEG/resize with the decode fetch, so "
            f"loop accounted {loop:.2f}s of {wall:.2f}s wall "
            f"(rest = scoring + loop body)"
        ),
        "cider": round(metrics["CIDEr"], 4),
    }
    print(json.dumps(out))

    if args.emit_json:
        import datetime

        import jax.numpy as jnp

        # transport weather: null round trips (tiny committed array -> host)
        probe = jax.device_put(jnp.zeros((8,), jnp.int32))
        np.asarray(probe)
        rts = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(probe)
            rts.append((time.perf_counter() - t0) * 1e3)
        rt_ms = float(np.median(rts))

        # device-only decode estimate on one batch shape: dispatch -> full fetch,
        # minus the null round trip (the token buffer is ~16 KB — transport is
        # round-trip-bound, not bandwidth-bound)
        from retr_tpu import decode as decode_mod
        from retr_tpu.data.dataset import pad_host_batch
        from retr_tpu.data.pipeline import device_batch
        from retr_tpu.masking import Masked

        host = next(iter(loader))
        batch = device_batch(pad_host_batch(host, cfg.batch_size), train=False)
        samples = Masked(batch.images, batch.image_masks)
        g = (Masked(batch.global_images, batch.global_masks)
             if batch.global_images is not None else None)
        tok_bos = tok.convert_tokens_to_ids(tok.cls_token)
        tok_eos = tok.convert_tokens_to_ids(tok.sep_token)

        def one_decode():
            return decode_mod.greedy(
                params, cfg, samples, global_samples=g, loc_feats=batch.loc_feats,
                max_len=cfg.max_position_embeddings, bos_token=tok_bos,
                eos_token=tok_eos, compute_dtype=jax.numpy.dtype(cfg.compute_dtype))

        np.asarray(one_decode())  # warm
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(one_decode())
            dts.append((time.perf_counter() - t0) * 1e3)
        device_est_ms = max(float(np.median(dts)) - rt_ms, 0.0)

        ms = lambda name: [round(v * 1e3, 2) for v in timer.samples.get(name, [])]
        fetch_ms = ms("fetch")
        art = {
            "generated": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"),
            "metric": out["metric"],
            "captions_per_sec": out["value"],
            "wall_s": out["wall_s"],
            "cider": out["cider"],
            "n_captions": n,
            "batch": args.batch,
            "decoder": args.decoder,
            "dtype": args.dtype,
            "per_batch_ms": {
                # host_prep: loader time NOT hidden by prefetch threads
                "host_wait": ms("host_wait"),
                # upload: device_batch (host collate + transfer dispatch)
                "upload_dispatch": ms("input"),
                # decode: program dispatch only (async — the fetch is the barrier)
                "decode_dispatch": ms("decode"),
                # fetch: device compute + transport round trip + queue
                "fetch": fetch_ms,
            },
            "score_ms": round(sum(timer.samples.get("score", [0.0])) * 1e3, 1),
            "transport_weather": {
                "null_roundtrip_ms": [round(x, 2) for x in rts],
                "null_roundtrip_ms_median": round(rt_ms, 2),
                "device_decode_ms_est": round(device_est_ms, 1),
                "note": (
                    f"fetch p50 {np.median(fetch_ms):.0f} ms vs device-only "
                    f"estimate {device_est_ms:.0f} ms -> transport+queue share "
                    f"{max(0.0, 1 - device_est_ms / max(np.median(fetch_ms), 1e-9)):.0%} "
                    "of the blocking fetch; compare null_roundtrip against the "
                    "~30 ms healthy-window baseline before reading anything "
                    "into run-to-run deltas (docs/ROADMAP.md tunnel weather)"
                ),
            },
        }
        with open(args.emit_json, "w") as f:
            json.dump(art, f, indent=2)
        print(f"wrote {args.emit_json}")


if __name__ == "__main__":
    main()
