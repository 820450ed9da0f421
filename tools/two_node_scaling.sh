#!/usr/bin/env bash
# North-rule two-cluster-size scaling evidence with REAL multi-raylet
# clusters (two object stores, blocks crossing the object-manager
# transfer path): the SAME headline job on a 1-raylet (4 CPU) cluster
# and then a 2-raylet (4+4 CPU) cluster, each a fresh `ray start`
# cluster; efficiency = thr_2node / (2 * thr_1node).
#
# This extends tools/two_node_smoke.sh (which proves cross-node
# execution) with the throughput measurement bench.py --scaling runs
# single-raylet. 4-CPU legs for the same reason bench.py defaults to
# --lo 2 --hi 8: this box's own CPU-process scaling ceiling masks
# pipeline scaling at higher core counts (see BASELINE.md).
#
# Usage: tools/two_node_scaling.sh [sf_dir] [repeat]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
REPEAT=${2:-128}
trap 'ray stop --force >/dev/null 2>&1 || true' EXIT

ray stop --force >/dev/null 2>&1 || true
ray start --head --num-cpus=4 --disable-usage-stats --port=6390 \
  >/dev/null 2>&1
ONE=$(RAY_ADDRESS=auto python tools/cluster_bench_driver.py "$SF" "$REPEAT")
ray stop --force >/dev/null 2>&1

ray start --head --num-cpus=4 --disable-usage-stats --port=6390 \
  >/dev/null 2>&1
ray start --address=127.0.0.1:6390 --num-cpus=4 --disable-usage-stats \
  >/dev/null 2>&1
TWO=$(RAY_ADDRESS=auto python tools/cluster_bench_driver.py "$SF" "$REPEAT")
ray stop --force >/dev/null 2>&1

python - "$ONE" "$TWO" <<'PYEOF'
import json, sys
one, two = json.loads(sys.argv[1]), json.loads(sys.argv[2])
assert one["nodes"] == 1 and two["nodes"] == 2, (one, two)
t1, t2 = one["rows"] / one["sec"], two["rows"] / two["sec"]
print(json.dumps({
    "metric": "two-raylet cluster scaling (1 node x4 CPU -> 2 nodes x4 CPU)",
    "rows": one["rows"],
    "sec_1node": one["sec"], "sec_2node": two["sec"],
    "thr_1node": round(t1, 2), "thr_2node": round(t2, 2),
    "scale_factor": 2,
    "efficiency": round(t2 / (2 * t1), 4),
}))
PYEOF
