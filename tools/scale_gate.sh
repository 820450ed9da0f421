#!/usr/bin/env bash
# Recorded gate for the amplified budget-regime tests (round-3 verdict
# task #7): the MinHash verification budget gates must trip on REAL
# volume (hundreds of MB of pair ids / candidate texts), not via
# budget override. Too slow for the default 4-CPU pytest session
# (pytest.ini deselects `-m scale`), so this script runs them at 16
# CPUs and the log is committed.
#
# Usage: tools/scale_gate.sh [out_file]   (default SCALE_GATE_r4.txt)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-SCALE_GATE_r4.txt}"
{
  echo "# Amplified budget-regime gate (pytest -m scale, 16 CPUs)"
  echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)  commit: $(git rev-parse --short HEAD)"
  PDFRAY_TEST_CPUS=16 python -m pytest tests/test_budget_regimes.py \
    -m scale -q --durations=0 -o addopts=
} 2>&1 | tee "$OUT"
tail -3 "$OUT"
