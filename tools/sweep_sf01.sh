#!/usr/bin/env bash
# Full-registry oracle sweep at sf0.1 — the 10x-scale correctness
# evidence the driver gate (sf0.01) doesn't cover. Round-3 verdict
# task #8: make the sweep a scripted, committed artifact instead of a
# one-off manual run.
#
# Usage: tools/sweep_sf01.sh [out_file]    (default SWEEP_r4.txt)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-SWEEP_r4.txt}"
{
  echo "# Full-registry oracle sweep @ /root/testdata/sf0.1"
  echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)  commit: $(git rev-parse --short HEAD)"
  python tools/check_oracle.py /root/testdata/sf0.1
} 2>&1 | tee "$OUT"
tail -1 "$OUT"
