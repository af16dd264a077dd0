#!/bin/bash
# Serial hardware-work queue for round 5: wait for the TPU relay to
# return (scripts/probe_tpu.sh touches bench_artifacts/r05/TPU_UP),
# then run every outstanding hardware item ONE AT A TIME — the 14:56
# concurrent attempt crashed the TPU worker (BENCH.md "Deployed
# configuration (round 5)" run history).  Each item logs under
# bench_artifacts/r05/ and failures don't block later items.
set -u
cd "$(dirname "$0")/.."
ART=bench_artifacts/r05
mkdir -p "$ART"

# 1. wait (up to ~6h) for the relay
for i in $(seq 1 140); do
  [ -f "$ART/TPU_UP" ] && break
  sleep 160
done
if [ ! -f "$ART/TPU_UP" ]; then
  echo "$(date -u +%FT%TZ) relay never returned" >> "$ART/hw_queue.log"
  exit 1
fi
echo "$(date -u +%FT%TZ) relay up — starting queue" >> "$ART/hw_queue.log"

run() {
  name=$1; shift
  echo "$(date -u +%FT%TZ) START $name" >> "$ART/hw_queue.log"
  timeout "$QT" "$@" > "$ART/$name.log" 2>&1
  rc=$?
  echo "$(date -u +%FT%TZ) DONE  $name rc=$rc" >> "$ART/hw_queue.log"
}

export PYTHONPATH=/root/.axon_site:/root/repo
PY=/opt/venv/bin/python

# 2. the full TPU gate suite -> HWGATES.jsonl (VERDICT r4 #2).
# One pytest process per gate with its own timeout: a single hung
# relay call must not eat the rest of the suite, and the persistent
# compile cache (enable_jax_cache) makes process isolation cheap.
GATES=$(grep -o '^def test_[a-z0-9_]*' tests/test_tpu_hw.py | sed 's/^def //')
for gtest in $GATES; do
  QT=1800 run "gate_$gtest" env DSABF_TPU_TESTS=1 \
    $PY -m pytest "tests/test_tpu_hw.py::$gtest" -q -rA
done

# 3. search-stage sweep (replaces the "in progress" BENCH.md line)
QT=3600 run measure_search2 $PY scripts/measure_search.py

# 4. mesh-driver overhead bound (VERDICT r4 #7)
QT=3600 run measure_mesh $PY scripts/measure_mesh_overhead.py

# 5. headline sanity
QT=1800 run bench_check $PY bench.py

echo "$(date -u +%FT%TZ) queue complete" >> "$ART/hw_queue.log"
