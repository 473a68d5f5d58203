#!/bin/bash
# Round-5 hardware session: close VERDICT r4 #3 (transformer-family perf
# story). Re-runs the unetr step/infer A/Bs lost to the r5 HTTP 500 and
# collects the per-phase + roofline numbers the UNETR closure note needs.
#
# Keep the host otherwise idle while this runs: paired A/Bs are confounded
# by concurrent CPU load (BASELINE r6 pipelined-A/B lesson).
#
# Usage: bash scripts/hw_session_r5.sh [outdir]
set -u
OUT=${1:-/tmp/hw_session_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? (log: $OUT/$name.log)"
  tail -8 "$OUT/$name.log" | sed 's/^/    /'
}

# First job pays the fused-loss transport probe (~5 min on a fresh
# machine, then cached; CLAUDE.md r8 — may wedge the first client, which
# the per-job timeout bounds). efficacy goes first: it is the verify
# recipe (train 40 epochs -> predict, dice>0.95) + the VERDICT r4 #2/#4
# evidence (tta=flips completing against the live platform — scan-form
# TTA replaced the 8x unroll that hung the remote compile — and the
# raw/EMA x tta-off/on paired dice table).
run efficacy_ema_tta  bash scripts/efficacy_ema_tta.sh "$OUT/efficacy"
run zoo_transformers  python scripts/bench_zoo.py --patch 64 --nets unetr,vtnet,unet
run transformer_prof  python scripts/transformer_profile.py --patch 128
run tlayout_step_ab   python scripts/bench_tlayout_conv.py --step-ab
run roofline_unetr    python scripts/roofline.py --network unetr --patch 128

echo "session logs in $OUT"
