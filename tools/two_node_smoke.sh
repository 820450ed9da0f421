#!/usr/bin/env bash
# Two-node local Ray cluster smoke (north-rule multi-node evidence in a
# single-machine sandbox): a head raylet plus a SECOND raylet joined
# via `ray start --address=` — two object stores, so Dataset blocks
# cross the object-manager transfer path between nodes exactly as on a
# real cluster. tools/two_node_driver.py attaches (the same
# cluster-attach path a `ray job submit` driver takes; the Job API
# itself needs dashboard packages this image lacks) and asserts the
# flagship extraction executed on BOTH node ids.
#
# Usage: tools/two_node_smoke.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
trap 'ray stop --force >/dev/null 2>&1 || true' EXIT
ray stop --force >/dev/null 2>&1 || true

ray start --head --num-cpus=4 --disable-usage-stats \
  --port=6390 >/dev/null 2>&1
ray start --address=127.0.0.1:6390 --num-cpus=4 \
  --disable-usage-stats >/dev/null 2>&1

RAY_ADDRESS=auto python tools/two_node_driver.py "$SF"
