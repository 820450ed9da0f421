#!/usr/bin/env bash
# `ray job submit` smoke for the CLI entry point (north-star: "runs via
# ray job submit on a fixed multi-node cluster").
#
# The Job Submission API is served by the Ray dashboard; when the
# dashboard packages are unavailable (this sandbox image has none —
# `ray start --include-dashboard=true` raises "Cannot include dashboard
# with missing packages"), fall back to the nearest equivalent: start a
# real head node with `ray start --head` and run the SAME CLI module
# against it via RAY_ADDRESS=auto — i.e. the exact code path a
# submitted job's driver executes (cluster attach, no local init).
#
# Usage: tools/ray_job_smoke.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=$(mktemp -d /tmp/ray_job_smoke.XXXXXX)
trap 'ray stop --force >/dev/null 2>&1 || true' EXIT
ray stop --force >/dev/null 2>&1 || true

if ray start --head --num-cpus=8 --include-dashboard=true \
      --disable-usage-stats >/dev/null 2>&1; then
  echo "# dashboard available: submitting through the Job API"
  ray job submit --working-dir . -- \
    python -m pdf_to_text_ray.cli --sf-dir "$SF" --output "$OUT/run"
else
  echo "# dashboard unavailable: driving the CLI against a bare head node"
  ray stop --force >/dev/null 2>&1 || true  # clear the failed attempt
  ray start --head --num-cpus=8 --disable-usage-stats >/dev/null 2>&1
  RAY_ADDRESS=auto python -m pdf_to_text_ray.cli \
    --sf-dir "$SF" --output "$OUT/run"
fi

echo "# wrote partitions:"
ls "$OUT/run/partitions" | head -3
echo "ray job smoke OK (output at $OUT)"
