"""Speed-of-light (roofline) accounting for the hot paths.

Three modes; outputs combine into docs/ROOFLINE.md:

  --mode analytic   (CPU) exact FLOP counts from XLA's own cost model
                    (`compiled.cost_analysis()`) for the real programs — encode
                    forward, one KV-cached decode step (+head+argmax), train
                    step — plus the *minimal* HBM traffic floor computed from
                    the param/cache pytrees (weights read once + caches read
                    once + activations ignored). Writes /tmp/roofline_analytic.json.
  --mode measure    (TPU) measures encode-only and full-greedy wall time at the
                    flagship config (differential fori-chain, single scalar
                    fetch — retr_tpu.utils.timing) and the train
                    step; derives per-decode-step ms. Writes /tmp/roofline_measured.json.
  --mode report     combines the two JSONs with the chip peaks into
                    docs/ROOFLINE.md.

Peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16, 819 GB/s HBM.

The point (docs/PERF.md is the narrative companion): say *quantitatively* how
far each hot loop sits from the hardware ceiling and why the remaining gap is
(measured to be) structural — per-fusion fixed cost on sub-millisecond steps —
rather than unclaimed kernel work.
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

IMAGE, MAX_LEN = 224, 128
ANALYTIC_PATH = "/tmp/roofline_analytic.json"
MEASURED_PATH = "/tmp/roofline_measured.json"


def flagship(use_pallas: bool):
    from retr_tpu.config import Config

    return Config(backbone="ResNet50", dilation=True, dropout=0.1,
                  use_pallas_decode=use_pallas, compute_dtype="bfloat16")


def _tree_bytes(tree, dtype_size):
    import jax

    return sum(int(np.prod(x.shape)) * dtype_size for x in jax.tree_util.tree_leaves(tree))


def _cost(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):  # older jax returns one dict per device program
        c = c[0]
    return {"flops": float(c.get("flops", 0.0)),
            "bytes": float(c.get("bytes accessed", 0.0))}


def analytic(batch: int, dec_batches=()):
    # Force CPU AFTER importing jax — the axon plugin overrides JAX_PLATFORMS
    # (docs/ROADMAP.md gotchas).
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from retr_tpu.masking import Masked
    from retr_tpu.models import caption, transformer
    from retr_tpu.train import state as tstate

    cfg = flagship(use_pallas=False)  # XLA path → cost model sees the real math
    params, _ = caption.build_model(cfg, jax.random.key(0))
    cdt = jnp.dtype(cfg.compute_dtype)
    img = jnp.zeros((batch, 3, IMAGE, IMAGE), jnp.float32)
    samples = Masked(img, jnp.zeros((batch, IMAGE, IMAGE), dtype=bool))

    out = {"batch": batch, "compute_dtype": str(cdt)}

    # -- encode forward (backbone + 6-layer encoder), the once-per-batch half
    enc = jax.jit(lambda p, s: caption.encode(p, cfg, s, compute_dtype=cdt))
    out["encode"] = _cost(enc, params, samples)

    # -- one decode step: embed + 6 cached decoder layers + MLP head + argmax
    # (eval_shape: build memory/pos without executing the batch-128 backbone on CPU)
    mem_s, mask_s, pos_s = jax.eval_shape(enc, params, samples)
    pos = jnp.zeros(pos_s.shape, pos_s.dtype)
    dsz = cdt.itemsize
    dec_params = {"dec": params["transformer"]["decoder"], "mlp": params["mlp"],
                  "emb": params["transformer"]["embeddings"]}

    def decode_cost(b):
        memory = jnp.zeros((b,) + mem_s.shape[1:], mem_s.dtype)
        mem_mask = jnp.zeros((b,) + mask_s.shape[1:], mask_s.dtype)
        cache, cross = transformer.init_decode_state(
            params["transformer"], memory, mem_mask, pos, cfg, MAX_LEN
        )

        def step_fn(p, cache, cross, tok, step):
            hs, cache = transformer.decode_step(p["transformer"], cache, cross, tok, step, cfg)
            logits = caption.mlp_head(p["mlp"], hs.reshape(hs.shape[0], -1))
            return jnp.argmax(logits, axis=-1), cache

        tok = jnp.full((b,), 101, jnp.int32)
        c = _cost(jax.jit(step_fn), params, cache, cross, tok, jnp.int32(5))
        # decode-step minimal HBM traffic: decoder+head weights + the KV caches
        # + cross K/V are *read once*; everything else stays in VMEM.
        c["min_bytes_floor"] = (_tree_bytes(dec_params, dsz)
                                + _tree_bytes(cache, dsz)
                                + _tree_bytes((cross.cross_k, cross.cross_v), dsz))
        return c

    out["decode_step"] = decode_cost(batch)
    out["decode_step"]["note"] = (
        "min_bytes_floor = decoder+embed+head weights + self KV caches + cross K/V, "
        "each read once per step (activations assumed VMEM-resident)"
    )
    # per-batch decode floors (VERDICT r4 item 1): the weights term is batch-
    # invariant; caches + cross K/V scale linearly, so SoL %s reveal where the
    # step transitions from launch/occupancy-bound to truly bandwidth-bound.
    out["decode_per_batch"] = {str(b): decode_cost(b) for b in dec_batches}

    # -- train step (fwd+bwd+AdamW) at the same batch
    tcfg = flagship(use_pallas=False)
    t_cap = tcfg.max_position_embeddings + 1
    tbatch = tstate.Batch(
        images=img,
        image_masks=jnp.zeros((batch, IMAGE, IMAGE), dtype=bool),
        caps=jnp.zeros((batch, t_cap), jnp.int32),
        cap_masks=jnp.zeros((batch, t_cap), dtype=bool),
    )
    tx = tstate.make_optimizer(tcfg, steps_per_epoch=1000)
    st = tstate.TrainState(params, tx.init(params), jnp.int32(0))
    step_d = tstate.make_train_step(tcfg, tx, donate=False)
    out["train_step"] = _cost(step_d, st, tbatch, jax.random.key(0))

    with open(ANALYTIC_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def measure_decode_steps(dec_batches, reps: int, rounds: int,
                         allow_layer_grid: bool = True, use_pallas: bool = True):
    """Per-batch decode-step device time (VERDICT r4 item 1): the REAL loop body
    — decode_step (production kernel path) + MLP head + argmax — chained
    (cache, tok) -> (cache', tok') with thread=True, so each iteration's argmax
    feeds the next embed and the carry aliases the caches in place, exactly like
    the production lax.while_loop. Step index fixed mid-buffer (cache blocks are
    full T_max, so per-step cost is step-independent). Returns {batch: seconds}."""
    if not dec_batches:
        return {}
    import jax
    import jax.numpy as jnp

    from retr_tpu import decode as decode_mod
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption, transformer
    from retr_tpu.utils.timing import time_chained

    cfg = flagship(use_pallas=use_pallas)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    cdt = jnp.dtype(cfg.compute_dtype)
    # memory shape from the real encoder (shape-only), values random
    mem_s, mask_s, pos_s = jax.eval_shape(
        jax.jit(lambda p, s: caption.encode(p, cfg, s, compute_dtype=cdt)),
        params,
        Masked(jnp.zeros((8, 3, IMAGE, IMAGE), jnp.float32),
               jnp.zeros((8, IMAGE, IMAGE), bool)),
    )
    s_len = mem_s.shape[1]
    pos = jax.random.normal(jax.random.key(1), (s_len, cfg.hidden_dim), jnp.float32)
    params_c, _, pos_c = decode_mod._cast_for_decode(params, jnp.zeros((), jnp.float32), pos, cdt)

    out = {}
    for b in dec_batches:
        memory = jax.random.normal(jax.random.key(2), (b, s_len, cfg.hidden_dim)).astype(cdt)
        mem_mask = jnp.zeros((b, s_len), bool)
        cache, cross = transformer.init_decode_state(
            params_c["transformer"], memory, mem_mask, pos_c, cfg, MAX_LEN,
            allow_layer_grid=allow_layer_grid,
        )

        # cross rides the loop carry (unchanged pass-through) instead of the
        # closure: closure-captured concrete arrays are baked into the program
        # as constants, and at b>=256 the ~0.6-1.2 GB of cross K/V literals
        # overflow the remote compile service's request limit (HTTP 413)
        def body(ct):
            c, tok, cr = ct
            hs, c2 = transformer.decode_step(
                params_c["transformer"], c, cr, tok, jnp.int32(MAX_LEN // 2), cfg)
            logits = caption.mlp_head(params_c["mlp"], hs)
            return c2, jnp.argmax(logits, axis=-1).astype(tok.dtype), cr

        tok0 = jnp.full((b,), 101, jnp.int32)
        # chain depth scaled so k * step >= ~100 ms: the differential of two
        # ~100 ms dispatches carries ~1 ms of transport noise, so sub-ms steps
        # need hundreds of chained iterations (k=12 at b=32 measured NEGATIVE)
        k = max(32, min(512, (4096 * 4) // b))
        t = time_chained(body, (cache, tok0, cross), k=k, rounds=rounds,
                         thread=True)
        print(f"[roofline {time.strftime('%H:%M:%S')}] decode step b={b}: "
              f"{t*1e3:.3f} ms", file=sys.stderr, flush=True)
        out[str(b)] = t
    return out


def measure(batch: int, reps: int, rounds: int, dec_batches=()):
    import jax
    import jax.numpy as jnp

    from retr_tpu import decode
    from retr_tpu.masking import Masked
    from retr_tpu.models import caption
    from retr_tpu.train import state as tstate

    cfg = flagship(use_pallas=True)
    params, _ = caption.build_model(cfg, jax.random.key(0))
    cdt = jnp.dtype(cfg.compute_dtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(batch, 3, IMAGE, IMAGE)), jnp.float32)
    samples = Masked(img, jnp.zeros((batch, IMAGE, IMAGE), dtype=bool))

    # Differential fori-chain protocol (retr_tpu.utils.timing): the function
    # under test runs k and 2k times serially inside one jitted loop with all
    # big inputs closure-captured and ONE scalar fetch; (T(2k)-T(k))/k cancels
    # the tunnel round trip AND the ~20 ms/call large-argument dispatch block.
    # The previous per-dispatch protocol overstated encode by ~6-14 ms of pure
    # transport (measured 2026-08-18: encode 26.9 ms per-dispatch vs 20.4 ms
    # chained; backbone sections sum to the chained number).
    from retr_tpu.utils.timing import time_chained

    def _log(msg):
        print(f"[roofline {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    _log("measuring encode (compile through the remote service takes minutes)")
    t_enc = time_chained(
        lambda s: caption.encode(params, cfg, s, compute_dtype=cdt)[0],
        samples, k=4 * reps, rounds=rounds)
    _log(f"encode {t_enc*1e3:.2f} ms; measuring full greedy")

    gkw = dict(max_len=MAX_LEN, bos_token=101, eos_token=cfg.vocab_size + 1,
               compute_dtype=cdt)
    t_full = time_chained(
        lambda s: decode.greedy(params, cfg, s, **gkw).astype(jnp.float32),
        samples, k=max(2, reps // 2), rounds=rounds)
    _log(f"full greedy {t_full*1e3:.1f} ms; measuring train step")

    # train step at the same batch, measured as main.py runs it: the output
    # state IS the next input (time_chained thread=True), so the fori_loop
    # carry aliases state buffers in place — the buffer-reuse semantics a
    # donating top-level step gets. The step is built donate=False because an
    # inner jit's donation flag is ignored once inlined into the timing loop
    # (and donate=True would free `params`, which the decode rows still use).
    t_cap = cfg.max_position_embeddings + 1
    tbatch = tstate.Batch(
        images=img,
        image_masks=jnp.zeros((batch, IMAGE, IMAGE), dtype=bool),
        caps=jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, t_cap)), jnp.int32),
        cap_masks=jnp.zeros((batch, t_cap), dtype=bool),
    )
    tx = tstate.make_optimizer(cfg, steps_per_epoch=1000)
    st = tstate.TrainState(params, tx.init(params), jnp.int32(0))
    step_d = tstate.make_train_step(cfg, tx, donate=False, memo=False)
    key = jax.random.key(0)

    def train_once(state):
        s2, _ = step_d(state, tbatch, key)
        return s2

    t_train = time_chained(train_once, st, k=max(2, reps), rounds=rounds,
                           thread=True)
    _log(f"train step {t_train*1e3:.1f} ms")

    out = {
        "batch": batch,
        "device": str(jax.devices()[0]),
        "encode_s": t_enc,
        "greedy_full_s": t_full,
        "decode_steps": MAX_LEN - 1,
        "decode_step_s": (t_full - t_enc) / (MAX_LEN - 1),
        "train_step_s": t_train,
        "decode_per_batch_s": measure_decode_steps(dec_batches, reps, rounds),
    }
    with open(MEASURED_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def report(peak_flops: float, peak_bw: float):
    a = json.load(open(ANALYTIC_PATH))
    m = json.load(open(MEASURED_PATH))
    assert a["batch"] == m["batch"], "analytic/measured batch mismatch"
    b = a["batch"]

    def row(name, flops, floor_bytes, t):
        # floor_bytes=None: XLA's CPU-layout byte counts are not meaningful HBM
        # traffic for TPU; those paths get a FLOPs-only (compute-roof) SoL.
        t_flops = flops / peak_flops
        t_bw = floor_bytes / peak_bw if floor_bytes else 0.0
        sol = max(t_flops, t_bw)
        bound = "compute (flops-only)" if t_flops >= t_bw else "bandwidth"
        return {
            "path": name, "measured_ms": t * 1e3, "sol_ms": sol * 1e3,
            "sol_fraction": sol / t, "bound": bound,
            "gflops": flops / 1e9,
            "hbm_mb": floor_bytes / 1e6 if floor_bytes else None,
        }

    rows = [
        row("encode (backbone+encoder fwd)", a["encode"]["flops"],
            None, m["encode_s"]),
        row("decode step (KV-cached, +head+argmax)", a["decode_step"]["flops"],
            a["decode_step"]["min_bytes_floor"], m["decode_step_s"]),
        row("train step (fwd+bwd+AdamW)", a["train_step"]["flops"],
            None, m["train_step_s"]),
    ]

    lines = [
        "# Roofline: measured vs speed-of-light (flagship config)",
        "",
        f"Chip: `{m['device']}` — peaks used: **{peak_flops/1e12:.0f} TFLOP/s bf16**, "
        f"**{peak_bw/1e9:.0f} GB/s HBM** (TPU v5e public specs). Batch {b}, "
        f"{a['compute_dtype']} compute, image 224², ResNet50+dilation, 6+6, d=256, "
        "vocab 30522.",
        "",
        "FLOPs are XLA's own cost model on the exact compiled programs "
        "(`compiled.cost_analysis()`, XLA path). The decode step's byte floor is "
        "analytic: decoder+head weights + self KV caches + cross K/V read once per "
        "step; activations assumed VMEM-resident. Measured times use the "
        "differential fori-chain protocol (`retr_tpu.utils.timing`): the program "
        "runs k and 2k times serially on-device inside one jitted loop and "
        "(T(2k)-T(k))/k is reported, so the tunnel round trip and per-dispatch "
        "transport cost cancel — these are true device times. The train row "
        "threads the output state back as the next input (`time_chained "
        "thread=True`), so the loop carry aliases state buffers in place — the "
        "production semantics of main.py's donating step. (Rounds 1-3 used a "
        "per-dispatch protocol that baked ~6-14 ms of transport into encode/train "
        "rows; the bench.py end-to-end rows still include transport deliberately, "
        "since a user pays it.)",
        "",
        "| path | measured | speed-of-light | % of SoL | bound by | GFLOP | HBM MB |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        mb = f"{r['hbm_mb']:.0f}" if r["hbm_mb"] else "—"
        lines.append(
            f"| {r['path']} | {r['measured_ms']:.2f} ms | {r['sol_ms']:.2f} ms | "
            f"{100*r['sol_fraction']:.0f}% | {r['bound']} | {r['gflops']:.1f} | {mb} |"
        )
    pct = {r["path"].split(" ")[0]: f"{100 * r['sol_fraction']:.0f}%" for r in rows}

    # per-batch decode SoL table (VERDICT r4 item 1)
    per_a = a.get("decode_per_batch", {})
    per_m = m.get("decode_per_batch_s", {})
    batch_rows = []
    for bs in sorted(per_m, key=int):
        if bs not in per_a:
            continue
        t_meas = per_m[bs]
        floor = per_a[bs]["min_bytes_floor"]
        fl = per_a[bs]["flops"]
        t_bw = floor / peak_bw
        t_fl = fl / peak_flops
        sol = max(t_bw, t_fl)
        batch_rows.append({
            "batch": int(bs), "measured_ms": t_meas * 1e3, "sol_ms": sol * 1e3,
            "sol_fraction": sol / t_meas, "hbm_mb": floor / 1e6,
            "achieved_gbps": floor / t_meas / 1e9,
            "bound": "bandwidth" if t_bw >= t_fl else "compute",
        })
    if batch_rows:
        lines += [
            "",
            "## Decode step vs speed-of-light, per batch (r5)",
            "",
            "Direct chained-step protocol (tools/roofline.py measure_decode_steps:",
            "the production decode_step + head + argmax threaded (cache, tok) ->",
            "(cache', tok') in one fori_loop — each argmax feeds the next embed, the",
            "carry aliases caches in place). Byte floor per batch = batch-invariant",
            "weights + linearly-scaling KV caches and cross K/V.",
            "",
            "| batch | measured | SoL | % of SoL | floor HBM MB | achieved GB/s (floor bytes / time) |",
            "|---|---|---|---|---|---|",
        ]
        for r in batch_rows:
            lines.append(
                f"| {r['batch']} | {r['measured_ms']:.3f} ms | {r['sol_ms']:.3f} ms | "
                f"{100*r['sol_fraction']:.0f}% | {r['hbm_mb']:.0f} | {r['achieved_gbps']:.0f} |"
            )
        lines += [
            "",
            "Reading: the weights term (~46 MB at bf16) dominates small batches, so",
            "low SoL %s there are launch/occupancy effects on tiny working sets; as",
            "batch grows the floor becomes cache-stream-dominated and the achieved",
            "GB/s column shows how close the step runs to the HBM ceiling at the",
            "batches the headline is quoted from.",
        ]
    lf = None
    lf_path = os.path.join(REPO, "docs", "LAUNCH_FLOOR.json")
    if os.path.exists(lf_path):
        lf = json.load(open(lf_path))["launch_floor"]
    lines += [
        "",
        f"Greedy end-to-end at batch {b}: encode {m['encode_s']*1e3:.1f} ms once + "
        f"{m['decode_steps']} × {m['decode_step_s']*1e3:.2f} ms decode steps = "
        f"{(m['encode_s']+m['decode_steps']*m['decode_step_s'])*1e3:.0f} ms "
        f"→ {b/(m['greedy_full_s']):.0f} captions/s single-stream.",
        "",
        "## Where the remaining gaps are (and why they are structural here)",
        "",
        f"**Decode step** ({pct['decode']} of a bandwidth roofline): the gap is NOT",
        "unclaimed kernel work — every fusion lever at this model size has been",
        "measured (docs/PERF.md): fused per-block Pallas kernels landed, merged-layer",
        "megakernel ≤ neutral, head+argmax kernel neutral, hierarchical top-k neutral,",
        "beam head top-k+logsumexp neutral. What remains is the fixed per-fusion/",
        "per-kernel cost (~10 µs each, ~15 XLA fusions per decoder layer on the XLA",
        "path; 3 Pallas programs + glue on the fused path) multiplied by a serial",
        "6-layer × 127-step dependency chain, plus while-loop bookkeeping — all",
        "independent of batch width. That is exactly why throughput scales with batch",
        "until VMEM saturation (measured curve: tools/exp_batch_scale.py; batch-512",
        "headline: docs/PERF.md r4): wider batches amortize the fixed cost per",
        "caption. The structural fix at production scale is batching, which the",
        "serving queue (predictor.py) and the batched eval default already do.",
        "",
        f"**Train step** ({pct['train']} of a compute roofline) and **encode**",
        f"({pct['encode']}): both are dominated by the d=256/14×14 model being small",
        "for the 128×128 MXU — conv channel/spatial dims and attention heads (dh=32)",
        "underfill tiles, and the backward pass doubles the count of small ops. These",
        "are model-shape limits, not missing kernels: the same programs reach MXU",
        "saturation as d grows. Training throughput still scales with batch",
        "(BENCH_DETAILS.json raw-step rows) for users who want larger batches.",
        "",
        "The two remaining encode hypotheses were measured in round 4 and both are",
        "neutral (tools/exp_encode.py, details in docs/PERF.md r4): an NHWC/HWIO",
        "backbone is 0.992× (XLA's layout assignment is already optimal from NCHW",
        "inputs, bit-exact A/B), and a space-to-depth stem rewrite is 1.009×",
        "full-backbone (the stem is 7% of the backbone; the underfill lives in every",
        "small conv, not the input layout). Encode is closed as a structural floor",
        "at this model size.",
        "",
    ]
    if lf:
        lines += [
            "## Per-launch / per-kernel floor (closes the decode-step question "
            "quantitatively)",
            "",
            f"Standalone sub-kernel costs at batch {lf.get('batch', 32)} "
            "(tools/exp_r4.py --launch-floor: each block chained "
            "data-dependently in a `fori_loop`, one scalar fetch at the end; "
            f"measured {lf.get('measured_at', '')}):",
            "",
            "| piece | standalone µs/iter |",
            "|---|---|",
            f"| tiny [8,128] Pallas kernel (pure fixed dispatch+loop-step cost) | {lf['tiny_kernel_us_per_launch']} |",
            f"| `ff_block` | {lf['ff_block_us']} |",
            f"| `cross_attn_block` | {lf['cross_attn_block_us']} |",
            f"| `self_attn_block` | {lf['self_attn_block_us']} |",
            f"| MLP head + argmax (XLA fusions) | {lf['mlp_head_argmax_us']} |",
            "",
            f"Sum of parts = {lf['sum_of_parts_us_per_step']} µs/step, vs the "
            "integrated split-kernel step's 535 µs and the LAYER_GRID "
            "single-launch step's 506 µs (batch 32, docs/PERF.md r4). Three "
            "conclusions the numbers force:",
            "",
            "1. **Each sub-kernel runs 14–26 µs above the 48 µs fixed cost** — "
            "per-phase compute at batch 32 is tiny; the phases are "
            "overhead-dominated in isolation.",
            "2. **The integrated program already pipelines dispatch**: parts sum "
            "to 2.5× the real step, and collapsing 19 launches/step to 4 "
            "(LAYER_GRID) saved only 29 µs — so amortized per-launch cost "
            "inside the decode while-loop is ~2 µs, not 48 µs. Launch count is "
            "NOT the remaining bottleneck.",
            "3. **The floor is the serial phase chain**: 18 data-dependent "
            "sub-kernel executions × (their standalone-minus-fixed compute) "
            "≈ 0.41 ms/step ≈ the measured 0.44–0.51 ms. At batch 32 the "
            "remaining headroom lives inside kernel occupancy (per-phase "
            "working sets of ~KB against a 900 MHz core), which is exactly why "
            "throughput comes from batch width (the re-based curve plateaus at "
            "~935 captions/s by batch 512 — docs/PERF.md r4), not from further "
            "launch surgery.",
            "",
        ]
    es_path = os.path.join(REPO, "docs", "ENCODE_SECTIONS.json")
    if os.path.exists(es_path):
        es = json.load(open(es_path))["encode_sections"]
        keys = ["stem+pool", "layer1", "layer2", "layer3", "layer4",
                "backbone_total", "encoder_only", "full_encode"]
        lines += [
            "## Where the encode time goes (per-section, true device time)",
            "",
            f"Batch {es.get('batch', 128)}, bfloat16, differential fori-chain "
            "protocol (tools/exp_encode.py --mode sections; "
            f"measured {es.get('measured_at', '').split('(')[0].strip()}):",
            "",
            "| section | ms |",
            "|---|---|",
            *[f"| {k} | {es[k]} |" for k in keys if k in es],
            "",
            f"{es.get('note', '')}",
            "",
        ]
    lines += [
        "Regenerate: `python tools/roofline.py --mode analytic && python",
        "tools/roofline.py --mode measure && python tools/roofline.py --mode report`",
        "(analytic runs on CPU; measure needs the chip and an idle host).",
    ]
    path = os.path.join(REPO, "docs", "ROOFLINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"rows": rows, "written": path}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["analytic", "measure", "report"], required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 128, 256, 512],
                    help="per-batch decode-step SoL table (VERDICT r4 item 1)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--peak-flops", type=float, default=197e12)
    ap.add_argument("--peak-bw", type=float, default=819e9)
    args = ap.parse_args()
    if args.mode == "analytic":
        analytic(args.batch, dec_batches=args.batches)
    elif args.mode == "measure":
        measure(args.batch, args.reps, args.rounds, dec_batches=args.batches)
    else:
        report(args.peak_flops, args.peak_bw)


if __name__ == "__main__":
    main()
