#!/usr/bin/env python
"""DSA-110 single-chip throughput sweep (VERDICT r2 #3).

DSA-110 (A=128, B=512, K=256 -> 2 MXU passes per weight term) is the
system's weakest measured number (0.581x realtime per chip, BENCH.md).
The pass count is fixed by the accuracy bar (>=12-bit weights x int8
MXU => 2x K-work), so the levers left are the tile space
(time_tile/chan_tile at this working set), t_block dispatch
amortization, and weight-mode variants.  This script measures them
back-to-back in ONE session (the CI chip swings ~20% between sessions,
so only same-session comparisons are load-bearing).

Writes one JSON line per variant to stdout; run with
  PYTHONPATH=/root/.axon_site:/root/repo nohup python scripts/sweep_dsa110.py \
      > /tmp/sweep110.jsonl 2>/tmp/sweep110.log &
(the TPU relay registers via sitecustomize on PYTHONPATH — replacing
PYTHONPATH silently drops to the CPU backend).  The script aborts if it
does not land on a TPU backend.
"""

import json
import sys


def main() -> int:
    import os

    import jax

    cache_dir = os.environ.get("DSABF_JAX_CACHE", "/tmp/dsabf-jax-cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dsabeamformer_tpu.config import DSA110
    from dsabeamformer_tpu.utils.bench import bench_kernel

    if jax.default_backend() == "cpu":
        print("FATAL: landed on the CPU backend — check PYTHONPATH "
              "includes /root/.axon_site", file=sys.stderr)
        return 1

    variants = [
        # (label, replace-kwargs)
        ("baseline_t2048_tt1024_fc4", {}),
        ("t4096_tt1024_fc4", dict(t_block=4096)),
        ("t4096_tt2048_fc2", dict(t_block=4096, time_tile=2048, chan_tile=2)),
        ("t4096_tt2048_fc1", dict(t_block=4096, time_tile=2048, chan_tile=1)),
        ("t2048_tt512_fc8", dict(time_tile=512, chan_tile=8)),
        ("t2048_tt2048_fc2", dict(time_tile=2048, chan_tile=2)),
        ("t4096_tt512_fc4", dict(t_block=4096, time_tile=512, chan_tile=4)),
        ("t8192_tt1024_fc4", dict(t_block=8192)),
        ("t4096_tt1024_fc4_int12", dict(t_block=4096, weight_mode="int12")),
    ]
    for label, kw in variants:
        cfg = DSA110.replace(**kw) if kw else DSA110
        try:
            rec = bench_kernel(cfg, n_blocks=8, n_distinct=2, repeats=2)
        except Exception as e:  # VMEM OOM etc: record and continue
            rec = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        rec["label"] = label
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
