#!/bin/bash
# Probe the axon TPU relay every ~3 min; append one line per attempt to
# bench_artifacts/r05/probe.log and touch bench_artifacts/r05/TPU_UP when
# a bounded matmul round-trip succeeds.  Used while the relay is down so
# the round's hardware measurements can resume the moment it returns.
cd /root/repo
mkdir -p bench_artifacts/r05
rm -f bench_artifacts/r05/TPU_UP
for i in $(seq 1 200); do
  ts=$(date -u +%H:%M:%S)
  out=$(timeout 120 /opt/venv/bin/python -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((256,256), jnp.bfloat16)
print('OK', d[0].platform, float((x@x).sum()))
" 2>&1 | tail -1)
  echo "$ts attempt=$i $out" >> bench_artifacts/r05/probe.log
  if [[ "$out" == OK* ]]; then
    touch bench_artifacts/r05/TPU_UP
    echo "$ts TPU reachable" >> bench_artifacts/r05/probe.log
    exit 0
  fi
  sleep 160
done
exit 1
