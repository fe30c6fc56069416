#!/bin/bash
# Regenerate every measured artifact in dependency order, on the real TPU.
#
# RUN ON AN IDLE HOST (no concurrent pytest!) — the 1-core host + tunnel skew
# concurrent timings 2-20x (docs/ROADMAP.md gotchas). Total ~45-60 min, mostly
# remote compiles on the first run.
#
# Artifacts produced:
#   PARITY_FULLSCALE.json        exact token parity at the reference's full scale
#   BENCH_DETAILS.json           full benchmark matrix (tools/bench_full.py)
#   docs/AB_BF16.json            bf16 A/B on trained ckpts, both variants
#                                (+ train_ab: f32-vs-bf16 TRAINING twin runs)
#   docs/BENCH_SERVING.json      serving latency under open-loop load + 60s soak
#   docs/E2E.json                per-batch host/upload/fetch phase breakdown +
#                                transport-weather probe (bench_e2e --emit-json)
#   stdout JSON lines            e2e eval (host-inclusive) greedy + beam
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 0/5 full-scale parity artifact (CPU; reference default config) =="
JAX_PLATFORMS=cpu python tools/parity_fullscale.py --batch 8 --steps 32

echo "== 1/5 bf16 A/B + trained checkpoints (base variant) =="
python tools/ab_bf16.py | tail -1 > /tmp/ab_base.json
echo "== 2/5 bf16 A/B (dual-stream glob_loc variant) =="
python tools/ab_bf16.py --variant glob_loc | tail -1 > /tmp/ab_glob.json
python - <<'EOF'
import json
base = json.load(open("/tmp/ab_base.json"))
glob = json.load(open("/tmp/ab_glob.json"))
cur = json.load(open("docs/AB_BF16.json"))
out = {"base_variant": base, "glob_loc_variant": glob,
       "note": cur.get("note", "")}
if "train_ab" in cur:
    out["train_ab"] = cur["train_ab"]
json.dump(out, open("docs/AB_BF16.json", "w"), indent=2)
EOF
echo "== 2b/5 f32-vs-bf16 TRAINING twin runs (merges train_ab into AB_BF16) =="
python tools/ab_bf16.py --train-ab | tail -2

echo "== 3/5 full benchmark matrix =="
python tools/bench_full.py

echo "== 4/5 end-to-end eval (host-inclusive), greedy + beam, median of 5/3 =="
python tools/bench_e2e.py --ckpt /tmp/retr_ab_ckpt/Concat_refcoco_checkpoint_0 \
    --dtype bfloat16 --reps 5 --emit-json docs/E2E.json
python tools/bench_e2e.py --ckpt /tmp/retr_ab_ckpt/Concat_refcoco_checkpoint_0 \
    --dtype bfloat16 --decoder beam --reps 3

echo "== 5/5 serving latency =="
python tools/bench_serving.py --ckpt /tmp/retr_ab_ckpt/Concat_refcoco_checkpoint_0 \
    --rates 20 50 100 200 400 --requests 150 | tail -1 > /tmp/serving_sweep.json
python - <<'PYEOF'
import json, time
cur = json.load(open("docs/BENCH_SERVING.json"))
new = json.load(open("/tmp/serving_sweep.json"))
cur["latest_sweep"] = new  # keep prior sweeps; transport varies >2x across hours
json.dump(cur, open("docs/BENCH_SERVING.json", "w"), indent=2)
print(json.dumps(new))
PYEOF

echo "== 5b/5 serving soak: 60 s sustained overload + graceful-drain assertion =="
python tools/bench_serving.py --ckpt /tmp/retr_ab_ckpt/Concat_refcoco_checkpoint_0 \
    --soak 60 --soak-rate 400 | tail -1 > /tmp/serving_soak.json
python - <<'PYEOF'
import json, sys
cur = json.load(open("docs/BENCH_SERVING.json"))
prev = cur.get("soak")
new = json.load(open("/tmp/serving_soak.json"))
cur["soak"], cur["soak_prev"] = new, (prev or cur.get("soak_prev"))
json.dump(cur, open("docs/BENCH_SERVING.json", "w"), indent=2)
print(json.dumps(new["summary"]))
# Regression bound (VERDICT r3 item 8, shed-aware since r5): under sustained
# overload p99 and achieved throughput (incl. drain) must stay within 20% of
# the last recorded soak. Tunnel weather varies >2x across hours for
# TRANSPORT-bound metrics, but the soak's p99 is queue-wait-dominated
# (scheduler property, not transport), so 20% is a meaningful pin.
bad = []
s = new["summary"]
if s["errors"] or s["unresolved_futures"]:
    bad.append("errors/unresolved futures under soak")
# Shed-mode structural bounds (VERDICT r4 item 3): at 400 rps offered vs ~145
# capacity, admission control MUST engage, and the MEDIAN accepted-request
# latency must stay within the bounded queue's drain depth (max_queued/
# max_batch + pipeline batches) x batch service time. p99 is weather-exposed:
# one multi-second tunnel stall on a full queue shows up directly in the tail
# (the 2026-08-19 run recorded an 8 s transport stall -> p99 13 s while p50
# stayed 1.4 s), so the tail is pinned loosely, the median structurally.
adm = s.get("admission", {})
if "rejected" in s:
    if s["offered"] > 2 * s["completed_ok"] and s["rejected"] == 0:
        bad.append("overload offered >2x capacity but nothing was shed")
    p50_bound = 10 * max(adm.get("batch_service_s", 0.0), 0.05)
    if new["p50_latency_s"] > p50_bound:
        bad.append(f"shed-mode p50 {new['p50_latency_s']:.2f}s exceeds "
                   f"queue-drain bound ({p50_bound:.2f}s)")
if prev:
    legacy = "rejected" not in prev["summary"]
    p99_old, p99_new = prev["p99_latency_s"], new["p99_latency_s"]
    if legacy:
        # transition from the unbounded-queue record: shedding must IMPROVE p99
        if p99_new >= p99_old:
            bad.append(f"shed-mode p99 {p99_new:.1f}s not better than "
                       f"unbounded-queue record {p99_old:.1f}s")
    else:
        if new["p50_latency_s"] > 1.5 * prev["p50_latency_s"]:
            bad.append(f"p50 {prev['p50_latency_s']:.2f}s -> "
                       f"{new['p50_latency_s']:.2f}s (> +50%)")
        if p99_new > 3.0 * p99_old:
            bad.append(f"p99 {p99_old:.2f}s -> {p99_new:.2f}s (> 3x)")
        r_old = prev["summary"]["achieved_rps_incl_drain"]
        r_new = s["achieved_rps_incl_drain"]
        if r_new < 0.5 * r_old:
            bad.append(f"achieved_rps_incl_drain {r_old:.1f} -> {r_new:.1f} "
                       "(< -50%; transport-weather-tolerant bound)")
if bad:
    print("SERVING SOAK REGRESSION: " + "; ".join(bad), file=sys.stderr)
    sys.exit(1)
print("soak regression bound OK (shed-mode tail + throughput pinned)")
PYEOF

echo "== 6/6 roofline: measured vs speed-of-light (rewrites docs/ROOFLINE.md) =="
JAX_PLATFORMS=cpu python tools/roofline.py --mode analytic
python tools/roofline.py --mode measure
python tools/roofline.py --mode report

echo "done — review git diff of BENCH_DETAILS.json / docs/*.json / docs/ROOFLINE.md before committing."
