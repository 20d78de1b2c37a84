#!/usr/bin/env bash
# Automated TPU re-drive queue (round 4; /tmp/tpu_queue.md as code).
#
# Waits for the relay (tools/relay_probe.py --watch), then runs every
# TPU-gated item in order, FAULT-ISOLATED: each step gets its own timeout
# + log file; a failing step never stops the queue (the round-3 lesson —
# one relay flap must not erase a session's evidence). If a step fails,
# the relay is re-triaged and, when it is down, the queue blocks until it
# recovers before the next step.
#
# Usage: bash tools/run_tpu_queue.sh [OUTDIR]    (default /tmp/tpu_queue_out)
# Progress: tail -f $OUTDIR/summary.jsonl  (one line per finished step)
set -u
# repo root (works when run from a copy outside the repo too — the driver
# pattern: copy to /tmp so later repo edits can't corrupt the running bash)
cd "$(dirname "$0")/.." 2>/dev/null || true
[ -f bench.py ] || cd /root/repo
OUT="${1:-/tmp/tpu_queue_out}"
mkdir -p "$OUT"
SUMMARY="$OUT/summary.jsonl"
: > "$SUMMARY"

wait_for_tpu() {
  python tools/relay_probe.py --watch --interval 90 --log "$OUT/probe.log"
}

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$OUT/$name.log" 2> "$OUT/$name.err"
  local rc=$? dt=$((SECONDS - t0))
  echo "{\"step\": \"$name\", \"rc\": $rc, \"wall_s\": $dt}" >> "$SUMMARY"
  echo "=== $name rc=$rc (${dt}s)"
  if [ "$rc" -ne 0 ]; then
    # re-triage: if the relay died/wedged mid-step, block until it is back
    python tools/relay_probe.py >> "$OUT/probe.log" 2>&1 || wait_for_tpu
  fi
  return "$rc"
}

wait_for_tpu || exit 1

# 1. certify the headline (VERDICT #1): bench.py has its own bounded-retry
#    probe + per-config fault isolation; stdout IS the artifact JSON line
step bench 4200 python bench.py
grep -q '"metric"' "$OUT/bench.log" && cp "$OUT/bench.log" "$OUT/bench_r5.json"
# protocol-aware no-regress arbitration vs the committed round-5 artifact
# (same program_sha1 + slower beyond the drift band = real regression)
[ -f "$OUT/bench_r5.json" ] && step bench_diff 120 \
  python tools/bench_diff.py demo/bench_r5_builder.json "$OUT/bench_r5.json"

# 2. fresh device trace vs the BASELINE.md contract row
#    (15.28 ms/epoch, jit_fused program fingerprint)
step trace 2400 python tools/trace_summary.py --out demo/trace_r5 \
  --dtype bfloat16 --upsample subpixel

# 3. kernel A/Bs (queued ROADMAP re-drives)
step kernel_ab_nll 2400 python tools/kernel_ab.py nll
step kernel_ab_gemm 2400 python tools/kernel_ab.py

# 4. real-chip test tier (incl. chol-VJP parity R∈{56,128,224} + serving path)
step tpu_tests 5400 env RUN_TPU_TESTS=1 python -m pytest tests/ -q -m tpu

# 5. CLI train drive (end-to-end through the real entry point)
step cli_train 1800 python -m gppvae_tpu train-gppvae --data synthetic \
  --num_objects 40 --num_views 8 --epochs 12 --bs 64 \
  --epochs_per_dispatch 6 --outdir "$OUT/cli_train"

# 6. serve done-criterion (VERDICT #3): face-view bf16+subpixel model at the
#    benched 128² shape -> export -> serve --repeat throughput
#    model config matches bench.py's face_view_128 contract config
#    (zdim=32, xdim=8, view_freqs=3) so the serve number is comparable
step face_train 3000 python -m gppvae_tpu train-gppvae --data faces \
  --image_size 128 --num_objects 50 --num_views 8 --epochs 12 --bs 64 \
  --zdim 32 --xdim 8 --view_freqs 3 --epochs_per_dispatch 6 \
  --dtype bfloat16 --dec_upsample subpixel --outdir "$OUT/face_model"
step face_export 1200 python -m gppvae_tpu generate \
  --state "$OUT/face_model/final_state" \
  --export_server "$OUT/face_model/model.srv" --outdir "$OUT/face_model"
REQS=$(python -c "print(','.join(f'{d}:{q}' for d in range(0,50,2) for q in range(8)))")
step face_serve 1200 python -m gppvae_tpu serve \
  --state "$OUT/face_model/model.srv" --requests "$REQS" --repeat 20 \
  --sustained 20 --outdir "$OUT/face_serve"
#    compiled-program artifact on the real chip: export (tpu+cpu lowering)
#    and answer from the blob alone, throughput vs the --state path
step face_export_exe 1200 python -m gppvae_tpu serve \
  --state "$OUT/face_model/model.srv" --export_exe "$OUT/face_model/model.exe"
step face_serve_exe 1200 python -m gppvae_tpu serve \
  --exe "$OUT/face_model/model.exe" --requests "$REQS" --repeat 20 \
  --sustained 20 --outdir "$OUT/face_serve_exe"

# 7. shape exploration (VERDICT #8's sanctioned perf lever)
step shape_explore 5400 python tools/shape_explore.py --out "$OUT/shapes.json"

# 8. ROADMAP #4: 1000-epoch face soak proving the saturation barrier stays
#    inert on real-valued data (two arms, bit-identical expected)
step face_soak 3600 python tools/face_soak.py

echo "queue complete:"
cat "$SUMMARY"
