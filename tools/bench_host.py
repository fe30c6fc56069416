"""Host input-pipeline benchmark: pad-to-square + PIL-exact BILINEAR resize.

Measures the three implementations of the per-sample image path (reference:
data_utils/refcoco.py:147-152 runs inside PIL's C code) on realistic RefCOCO
image sizes (300-640 px -> 224x224):

  - native  : C++ core (native/preprocess.cc) — fused pad-clamped conv windows,
              RGBX uint32 transposes, int32 fixed point, auto-vectorized
  - pillow  : PIL Image.resize on the numpy-padded square (the reference path)
  - numpy   : the executable spec (retr_tpu.ops.image) — correctness reference

All three produce identical bytes (tests/test_native.py); this tool checks that
again on its own inputs before timing. Run on an otherwise-idle host: the 1-core
bench machines timeshare, and a concurrent pytest run skews results 5-20x.

Usage: python tools/bench_host.py [--images 64] [--out 224] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--out", type=int, default=224)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    from retr_tpu import native
    from retr_tpu.ops import image as img_ops

    rng = np.random.default_rng(args.seed)
    imgs = [
        rng.integers(0, 256, size=(int(rng.integers(300, 640)), int(rng.integers(300, 640)), 3),
                     dtype=np.uint8)
        for _ in range(args.images)
    ]

    have_native = native.available()
    results = {}

    # correctness cross-check on the first few inputs before timing anything
    for im in imgs[:4]:
        spec = img_ops.pil_resize_uint8(img_ops.pad_uint8_to_square(im), args.out, args.out)
        pil = np.asarray(
            Image.fromarray(img_ops.pad_uint8_to_square(im)).resize(
                (args.out, args.out), Image.BILINEAR
            )
        )
        assert np.array_equal(spec, pil), "numpy spec diverged from Pillow"
        if have_native:
            assert np.array_equal(native.pad_resize_image(im, args.out), spec), \
                "native core diverged from the spec"

    def timed(fn, n=args.images):
        fn(imgs[0])  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for im in imgs:
                fn(im)
            best = min(best, time.perf_counter() - t0)
        return n / best

    if have_native:
        results["native_img_per_s"] = round(timed(lambda im: native.pad_resize_image(im, args.out)), 1)

        def batch_all(_):
            pass
        native.pad_resize_image_batch(imgs, args.out, n_threads=os.cpu_count() or 1)  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            native.pad_resize_image_batch(imgs, args.out, n_threads=os.cpu_count() or 1)
            best = min(best, time.perf_counter() - t0)
        results["native_batch_img_per_s"] = round(args.images / best, 1)

    results["pillow_img_per_s"] = round(
        timed(lambda im: Image.fromarray(img_ops.pad_uint8_to_square(im)).resize(
            (args.out, args.out), Image.BILINEAR)), 1)
    # the numpy spec is ~100x slower; time it on a subset
    sub = imgs[: max(2, args.images // 16)]
    t0 = time.perf_counter()
    for im in sub:
        img_ops.pil_resize_uint8(img_ops.pad_uint8_to_square(im), args.out, args.out)
    results["numpy_spec_img_per_s"] = round(len(sub) / (time.perf_counter() - t0), 2)

    out = {
        "metric": f"host pad+resize to {args.out}px (300-640px inputs, 1 thread)",
        "unit": "img/s",
        "cores": os.cpu_count(),
        **results,
    }
    if have_native:
        out["native_vs_pillow"] = round(results["native_img_per_s"] / results["pillow_img_per_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
