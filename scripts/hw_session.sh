#!/bin/bash
# One-shot hardware measurement session: run every pending TPU bench and
# capture all output. Intended to run as soon as the tunneled TPU
# recovers (probe it first: timeout 120 python -c "import jax; jax.devices()").
#
# Usage: bash scripts/hw_session.sh [outdir]
set -u
OUT=${1:-/tmp/hw_session_$(date +%H%M)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? (log: $OUT/$name.log)"
  tail -8 "$OUT/$name.log" | sed 's/^/    /'
}

run bench            python bench.py
run tlayout_conv     python scripts/bench_tlayout_conv.py
run transpose_phased python scripts/bench_transpose_phased.py
run dilated_tapgroup python scripts/bench_dilated_tapgroup.py
run device_aug       python scripts/bench_device_aug.py
run roofline_densenet python scripts/roofline.py --network densenet --patch 64
run roofline_fcn3d   python scripts/roofline.py --network fcn3d --patch 64

echo "session logs in $OUT"
