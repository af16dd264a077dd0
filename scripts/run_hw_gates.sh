#!/bin/bash
# Run the full TPU hardware-gate suite on the real chip, recording every
# gate in HWGATES.jsonl (tests/conftest.py appends one JSON line per
# gate when DSABF_TPU_TESTS=1).  Serial (-p no:xdist implied by -n0
# absence), generous timeout: first compiles go through the remote
# Mosaic hop.
#
#   bash scripts/run_hw_gates.sh [pytest-args...]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export DSABF_TPU_TESTS=1
exec /opt/venv/bin/python -m pytest tests/test_tpu_hw.py -q -rA "$@"
