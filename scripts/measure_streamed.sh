#!/bin/bash
# The streamed (ingest-inclusive) north-star stats line on hardware
# (VERDICT r4 #3): one paced `dsabf simulate` -> shm ring -> `dsabf
# run` per preset, the REAL driver path (ring attach, staging pool,
# device_put, fused kernel, 8-bit fil sink, fused-SK RFI monitor,
# live search monitor) — not a dispatch loop.  The CI relay moves
# ~0.4 GB/s H2D vs the 32 GB/s the full DSA-10 wire needs, so the
# published number is honestly relay-bound; the producer is
# unthrottled with nbufs >= blocks+2 so the ring never drops and the
# consumer's wall clock measures its own ingest+compute, not pacing.
#
# Budget: 8 x 2 GiB (dsa10) + 8 x 0.5 GiB (dsa10c) = 20 GiB H2D,
# under the ~40 GB relay-leak cap (BENCH.md "Memory stability").
set -u
cd "$(dirname "$0")/.."
ART=bench_artifacts/r05
mkdir -p "$ART"
export PYTHONPATH=/root/.axon_site:/root/repo
PY=/opt/venv/bin/python

for CFGN in dsa10 dsa10c; do
  FILD=$(mktemp -d /tmp/strm_fil_XXXX)
  echo "$(date -u +%FT%TZ) streamed $CFGN start" >> "$ART/streamed.log"
  # producer first: creates the ring, generates 2 distinct noise
  # blocks, fills unthrottled, lingers while the consumer drains
  timeout 1800 $PY -m dsabeamformer_tpu.cli simulate \
      --key strm --config "$CFGN" --blocks 8 --nbufs 10 --distinct 2 \
      --linger 1200 > "$ART/streamed_${CFGN}_sim.log" 2>&1 &
  SIM=$!
  sleep 5
  timeout 1700 $PY -m dsabeamformer_tpu.cli run \
      --key strm --config "$CFGN" --blocks 8 --timeout 900 \
      --fil-dir "$FILD" --fil-bits 8 --rfi-auto --search-dm-max 100 \
      --stats-file "$ART/streamed_${CFGN}_blocks.jsonl" \
      > "$ART/streamed_${CFGN}_run.log" 2>&1
  RC=$?
  wait $SIM
  echo "$(date -u +%FT%TZ) streamed $CFGN rc=$RC" >> "$ART/streamed.log"
  rm -rf "$FILD"
done
echo "$(date -u +%FT%TZ) streamed done" >> "$ART/streamed.log"
