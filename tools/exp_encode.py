"""Encode-floor probes: where do the 41.5 ms go, and do layout/stem rewrites help?

docs/ROOFLINE.md puts encode (backbone+encoder fwd) at ~25% of a flops-only
speed-of-light. This script answers, with measurements on the real chip:

  --mode sections   per-section timing map (stem+pool, layer1..4, encoder,
                    full encode) — each jitted separately, so the sum carries
                    some double-counted fusion-boundary cost, but the *ratios*
                    locate the time.
  --mode nhwc      A/B: identical backbone math with NHWC activations and HWIO
                    weights (transposed once, outside the timed region) vs the
                    shipped NCHW path. XLA-TPU layout assignment is supposed to
                    make this a wash; measure, don't assume.
  --mode s2d       A/B: space-to-depth stem — conv1 (7x7/s2 over 3 channels,
                    3/128 MXU lane utilization) rewritten as the exact
                    equivalent 4x4/s1 conv over a [B,12,112,112] block-2
                    space-to-depth input (the MLPerf-ResNet trick). Exactness
                    is asserted (same math, reassociated sums) before timing.

Protocol (tunnel-safe, see docs/ROADMAP.md gotchas): `block_until_ready` is NOT
a barrier through the tunnel and each host fetch costs a ~25 ms round trip, so
per-dispatch timing drowns in transport. Every number here instead times the
section applied `k` and `2k` times serially inside ONE jitted `fori_loop` (a
one-element in-place perturbation of the loop-carried input defeats
loop-invariant code motion), fetches ONE scalar, and reports
(T(2k) - T(k)) / k — the round trip and all fixed dispatch cost cancel in the
difference. Run on an idle host.

Reference scope: the backbone these probes rewrite is the reference's frozen
torchvision ResNet (reference models/backbone.py:16-93); the rewrites must stay
bit-compatible with torchvision conv semantics, which is why every variant is
allclose-gated against the shipped path before its time is reported.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMAGE = 224


def flagship():
    from retr_tpu.config import Config

    return Config(backbone="ResNet50", dilation=True, dropout=0.1,
                  use_pallas_decode=True, compute_dtype="bfloat16")


def _time(fn, args, reps, rounds, k=None):
    """Per-application seconds of fn(*args) via the shared differential
    fori-chain protocol (retr_tpu.utils.timing). `reps`*4 sets the chain
    depth k."""
    from retr_tpu.utils.timing import time_chained

    (x,) = args
    return time_chained(fn, x, k=k or max(8, reps * 4), rounds=rounds)


# ---------------------------------------------------------------------------------
# sections
# ---------------------------------------------------------------------------------


def mode_sections(args):
    import jax
    import jax.numpy as jnp

    from retr_tpu.masking import Masked, downsample_mask_nearest
    from retr_tpu.models import caption, resnet, transformer
    from retr_tpu.precision import matmul_precision

    cfg = flagship()
    dtype = jnp.dtype(cfg.compute_dtype)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    b = args.batch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(b, 3, IMAGE, IMAGE)).astype(np.float32))
    mask = jnp.zeros((b, IMAGE, IMAGE), dtype=bool)

    bb = params["backbone"]
    name, dil = cfg.backbone, cfg.dilation
    block_type, plan = resnet.resnet_structure(name, dil)
    block_apply = (resnet._bottleneck_apply if block_type == "bottleneck"
                   else resnet._basic_apply)
    bb16 = jax.tree.map(lambda a: a.astype(dtype), bb)

    @jax.jit
    def stem(x):
        with matmul_precision(dtype):
            x = x.astype(dtype)
            x = jax.nn.relu(resnet._bn(bb16["bn1"],
                                       resnet._conv(bb16["conv1"]["w"], x, stride=2, padding=3)))
            return resnet._max_pool_3x3s2(x)

    def stage_fn(stage):
        @jax.jit
        def run(x):
            with matmul_precision(dtype):
                for block_p, (stride, d, _) in zip(bb16[f"layer{stage + 1}"], plan[stage]):
                    x = block_apply(block_p, x, stride, d)
            return x
        return run

    @jax.jit
    def full_encode(samples):
        return caption.encode(params, cfg, samples, compute_dtype=dtype)

    @jax.jit
    def backbone_only(x):
        return resnet.apply(bb, x, name=name, dilation=dil, compute_dtype=dtype)

    def _rec(sections, name, val):
        sections[name] = val
        print(f"# {name}: {val * 1e3:.3f} ms", flush=True)

    sections = {}
    x = stem(img)
    _rec(sections, "stem+pool", _time(stem, (img,), args.reps, args.rounds))
    feats = x
    for stage in range(4):
        fn = stage_fn(stage)
        nxt = fn(feats)
        _rec(sections, f"layer{stage + 1}",
             _time(fn, (feats,), args.reps, args.rounds))
        feats = nxt

    # encoder on real backbone features
    samples = Masked(img, mask)
    _rec(sections, "backbone_total",
         _time(backbone_only, (img,), args.reps, args.rounds))

    fmask = downsample_mask_nearest(mask, feats.shape[-2], feats.shape[-1])

    from retr_tpu.models import layers

    @jax.jit
    def encoder_only(f):
        # input_proj + transformer.encode, exactly the seam caption.encode uses
        # (build_encoder_input's _backbone_features tail + the swapaxes pair).
        b2, c2, h2, w2 = f.shape
        with matmul_precision(dtype):
            src = layers.linear(params["input_proj"],
                                f.reshape(b2, c2, h2 * w2).swapaxes(1, 2))
            mflat = fmask.reshape(b2, h2 * w2)
            return transformer.encode(params["transformer"], src, mflat, cfg)[0]

    _rec(sections, "encoder_only",
         _time(encoder_only, (feats,), args.reps, args.rounds))
    _rec(sections, "full_encode",
         _time(full_encode, (samples,), args.reps, args.rounds))

    out = {k: round(v * 1e3, 2) for k, v in sections.items()}
    out["batch"] = b
    print(json.dumps(out))


# ---------------------------------------------------------------------------------
# NHWC backbone variant (weights transposed once, math identical)
# ---------------------------------------------------------------------------------


def _conv_nhwc(w_hwio, x, stride=1, padding=0, dilation=1):
    import jax

    return jax.lax.conv_general_dilated(
        x, w_hwio,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn_nhwc(p, x):
    return x * p["scale"][None, None, None, :] + p["bias"][None, None, None, :]


def _bottleneck_nhwc(p, x, stride, dilation):
    import jax

    out = jax.nn.relu(_bn_nhwc(p["bn1"], _conv_nhwc(p["conv1"]["w"], x)))
    out = jax.nn.relu(_bn_nhwc(p["bn2"], _conv_nhwc(p["conv2"]["w"], out, stride=stride,
                                                    padding=dilation, dilation=dilation)))
    out = _bn_nhwc(p["bn3"], _conv_nhwc(p["conv3"]["w"], out))
    identity = x
    if "downsample" in p:
        identity = _bn_nhwc(p["downsample"]["bn"],
                            _conv_nhwc(p["downsample"]["conv"]["w"], x, stride=stride))
    return jax.nn.relu(out + identity)


def _to_hwio(tree):
    import jax
    import jax.numpy as jnp

    def fix(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "w" in names and leaf.ndim == 4:  # OIHW -> HWIO
            return jnp.transpose(leaf, (2, 3, 1, 0))
        return leaf

    return jax.tree_util.tree_map_with_path(fix, tree)


def nhwc_backbone(bb_hwio, x_nhwc, name, dilation, dtype):
    import jax

    from retr_tpu.models import resnet
    from retr_tpu.precision import matmul_precision

    _, plan = resnet.resnet_structure(name, dilation)
    bb_hwio = jax.tree.map(lambda a: a.astype(dtype), bb_hwio)
    with matmul_precision(dtype):
        x = x_nhwc.astype(dtype)
        x = jax.nn.relu(_bn_nhwc(bb_hwio["bn1"],
                                 _conv_nhwc(bb_hwio["conv1"]["w"], x, stride=2, padding=3)))
        # maxpool in NHWC
        import jax.numpy as jnp
        y = jax.lax.reduce_window(
            x.astype(jnp.float32), -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=[(0, 0), (1, 1), (1, 1), (0, 0)])
        x = y.astype(x.dtype)
        for stage in range(4):
            for block_p, (stride, d, _) in zip(bb_hwio[f"layer{stage + 1}"], plan[stage]):
                x = _bottleneck_nhwc(block_p, x, stride, d)
    return x


def mode_nhwc(args):
    import jax
    import jax.numpy as jnp

    from retr_tpu.models import caption, resnet

    cfg = flagship()
    dtype = jnp.dtype(cfg.compute_dtype)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    bb = params["backbone"]
    bb_hwio = _to_hwio(bb)
    b = args.batch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(b, 3, IMAGE, IMAGE)).astype(np.float32))
    img_nhwc = jnp.transpose(img, (0, 2, 3, 1))

    @jax.jit
    def base(x):
        return resnet.apply(bb, x, name=cfg.backbone, dilation=cfg.dilation,
                            compute_dtype=dtype)

    @jax.jit
    def variant(x):
        return nhwc_backbone(bb_hwio, x, cfg.backbone, cfg.dilation, dtype)

    ya = np.asarray(base(img), np.float32)
    yb = np.transpose(np.asarray(variant(img_nhwc), np.float32), (0, 3, 1, 2))
    err = float(np.max(np.abs(ya - yb)) / max(1e-9, float(np.max(np.abs(ya)))))
    t_base = _time(base, (img,), args.reps, args.rounds)
    t_var = _time(variant, (img_nhwc,), args.reps, args.rounds)
    print(json.dumps({"batch": b, "rel_err": err,
                      "nchw_ms": round(t_base * 1e3, 2),
                      "nhwc_ms": round(t_var * 1e3, 2),
                      "speedup": round(t_base / t_var, 3)}))


# ---------------------------------------------------------------------------------
# space-to-depth stem
# ---------------------------------------------------------------------------------


def s2d_pack(x):
    """[B,3,H,W] -> [B,12,H/2,W/2], channel index = c*4 + u*2 + v for pixel
    (2a+u, 2b+v)."""
    import jax.numpy as jnp

    bsz, c, h, w = x.shape
    x = x.reshape(bsz, c, h // 2, 2, w // 2, 2)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(bsz, c * 4, h // 2, w // 2)


def s2d_weights(w):
    """conv1 OIHW [64,3,7,7] -> equivalent [64,12,4,4] over the s2d input.

    Derivation: output row i reads input rows r = 2i + p - 3, p in [0,7).
    Writing r = 2(i+t) + u with u in {0,1} gives kernel tap t in {-2..1} and
    p = 2t + u + 3; the (t=-2, u=0) tap (p=-1) has no source weight -> zero.
    Conv over the s2d grid is then stride 1, kernel 4, padding (left 2, right 1).
    """
    import numpy as np

    w = np.asarray(w, np.float32)
    o = w.shape[0]
    w_new = np.zeros((o, 12, 4, 4), np.float32)
    for u in range(2):
        for v in range(2):
            for tr in range(-2, 2):
                for tc in range(-2, 2):
                    p, q = 2 * tr + u + 3, 2 * tc + v + 3
                    if 0 <= p < 7 and 0 <= q < 7:
                        for c in range(3):
                            w_new[:, c * 4 + u * 2 + v, tr + 2, tc + 2] = w[:, c, p, q]
    return w_new


def mode_s2d(args):
    import jax
    import jax.numpy as jnp

    from retr_tpu.models import caption, resnet
    from retr_tpu.precision import matmul_precision

    cfg = flagship()
    dtype = jnp.dtype(cfg.compute_dtype)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    bb = params["backbone"]
    b = args.batch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(b, 3, IMAGE, IMAGE)).astype(np.float32))

    w_s2d = jnp.asarray(s2d_weights(bb["conv1"]["w"]))
    bb16 = jax.tree.map(lambda a: a.astype(dtype), bb)
    w_s2d16 = w_s2d.astype(dtype)
    _, plan = resnet.resnet_structure(cfg.backbone, cfg.dilation)

    def stem_base(x):
        with matmul_precision(dtype):
            x = x.astype(dtype)
            x = jax.nn.relu(resnet._bn(bb16["bn1"],
                                       resnet._conv(bb16["conv1"]["w"], x, stride=2, padding=3)))
            return resnet._max_pool_3x3s2(x)

    def stem_s2d(x):
        with matmul_precision(dtype):
            x = s2d_pack(x.astype(dtype))
            y = jax.lax.conv_general_dilated(
                x, w_s2d16, window_strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            y = jax.nn.relu(resnet._bn(bb16["bn1"], y))
            return resnet._max_pool_3x3s2(y)

    def full(stem, x):
        block_apply = resnet._bottleneck_apply
        with matmul_precision(dtype):
            h = stem(x)
            for stage in range(4):
                for block_p, (stride, d, _) in zip(bb16[f"layer{stage + 1}"], plan[stage]):
                    h = block_apply(block_p, h, stride, d)
        return h

    jf_base_stem = jax.jit(stem_base)
    jf_s2d_stem = jax.jit(stem_s2d)
    ya = np.asarray(jf_base_stem(img), np.float32)
    yb = np.asarray(jf_s2d_stem(img), np.float32)
    err = float(np.max(np.abs(ya - yb)) / max(1e-9, float(np.max(np.abs(ya)))))

    jf_base = jax.jit(functools.partial(full, stem_base))
    jf_s2d = jax.jit(functools.partial(full, stem_s2d))
    t_stem_a = _time(jf_base_stem, (img,), args.reps, args.rounds)
    t_stem_b = _time(jf_s2d_stem, (img,), args.reps, args.rounds)
    t_a = _time(jf_base, (img,), args.reps, args.rounds)
    t_b = _time(jf_s2d, (img,), args.reps, args.rounds)
    print(json.dumps({"batch": b, "stem_rel_err": err,
                      "stem_base_ms": round(t_stem_a * 1e3, 3),
                      "stem_s2d_ms": round(t_stem_b * 1e3, 3),
                      "full_base_ms": round(t_a * 1e3, 2),
                      "full_s2d_ms": round(t_b * 1e3, 2),
                      "stem_speedup": round(t_stem_a / t_stem_b, 3),
                      "full_speedup": round(t_a / t_b, 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True, choices=["sections", "nhwc", "s2d"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    {"sections": mode_sections, "nhwc": mode_nhwc, "s2d": mode_s2d}[args.mode](args)


if __name__ == "__main__":
    main()
