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
    from dsabeamformer_tpu.config import DSA110
    from dsabeamformer_tpu.utils.bench import bench_kernel
    from dsabeamformer_tpu.utils.hostenv import enable_jax_cache, require_tpu_backend

    enable_jax_cache()
    if not require_tpu_backend():
        return 1

    # Explicit kwargs everywhere (never rely on the preset's current
    # values — the round-3 sweep moved DSA110 itself to t_block=4096,
    # which would silently re-point bare-{} variants); labels are
    # DERIVED from the resolved config so they can't go stale again.
    variants = [
        dict(t_block=2048, time_tile=1024, chan_tile=4),  # r2 baseline
        dict(t_block=4096, time_tile=1024, chan_tile=4),  # now the preset
        dict(t_block=4096, time_tile=2048, chan_tile=2),
        dict(t_block=4096, time_tile=2048, chan_tile=1),
        dict(t_block=2048, time_tile=512, chan_tile=8),
        dict(t_block=2048, time_tile=2048, chan_tile=2),
        dict(t_block=4096, time_tile=512, chan_tile=4),
        dict(t_block=8192, time_tile=1024, chan_tile=4),
        dict(t_block=4096, time_tile=1024, chan_tile=4, weight_mode="int12"),
    ]
    for kw in variants:
        cfg = DSA110.replace(**kw)
        label = (f"t{cfg.t_block}_tt{cfg.time_tile}_fc{cfg.chan_tile}"
                 + ("" if cfg.weight_mode == "int8x2"
                    else f"_{cfg.weight_mode}"))
        try:
            rec = bench_kernel(cfg, n_blocks=8, n_distinct=2, repeats=2)
        except Exception as e:  # VMEM OOM etc: record and continue
            rec = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        rec["label"] = label
        rec["t_block"] = cfg.t_block
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
