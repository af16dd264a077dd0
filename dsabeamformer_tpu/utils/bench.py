"""Single-chip benchmarks: the north-star measurement
(BASELINE.json `metric`: voltage GB/s per chip; real-time factor vs the
DSA-10 stream rate).

Two modes:

- ``stream``: end-to-end host->HBM ingest through the streaming driver
  (BASELINE config 4) — what the observatory would actually sustain.
- ``kernel``: device-resident hot loop — blocks pre-staged in HBM,
  n_blocks back-to-back *dispatches* of the fused block step (exactly
  the production streaming shape: one dispatch per block).  Dispatches
  pile up in the device queue and execute serially, so wall/n_blocks is
  the true per-block device time including the per-dispatch cost the
  streaming driver actually pays.  (The round-1 harness timed a
  ``lax.scan`` chain instead, which measured ~35% slower: the
  stacked-input dynamic-slice copy per iteration is a benchmark
  artifact, not production work — BENCH.md round 2.)

NOTE on timing over the axon relay: ``block_until_ready`` does not
reliably fence remote execution, so both modes force a scalar digest
fetch to close the timing interval.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from dsabeamformer_tpu.config import ObsConfig
from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
from dsabeamformer_tpu.models.weights import make_weights
from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
from dsabeamformer_tpu.ops.quantize import quantize_weights
from dsabeamformer_tpu.pipeline import SyntheticSource, run_stream
from dsabeamformer_tpu.utils.metrics import mxu_utilization_both


@jax.jit
def _digest(x):
    return x.sum()


def bench_kernel(cfg: ObsConfig, n_blocks: int = 16, n_distinct: int = 2,
                 repeats: int = 3) -> dict:
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    blocks = [
        jax.device_put(
            device_wire_view(make_random_bytes_block(cfg, seed=s), cfg)
        )
        for s in range(n_distinct)
    ]
    float(_digest(beamform_power(blocks[0], qw, cfg)))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(n_blocks):
            out = beamform_power(blocks[i % n_distinct], qw, cfg)
        float(_digest(out))
        best = min(best, (time.perf_counter() - t0) / n_blocks)
    util = mxu_utilization_both(
        cfg.macs_per_block * cfg.n_weight_terms, best, cfg,
        int8="int8" in cfg.weight_mode,
    )
    return {
        "mode": "kernel",
        "config": cfg.name,
        "ms_per_block": best * 1e3,
        "gb_per_s": cfg.wire_block_bytes / best / 1e9,
        "realtime_factor": cfg.block_duration_s / best,
        "mxu_utilization_issued": None if util is None else util["issued"],
        "mxu_utilization_padded_k":
            None if util is None else util["padded_k"],
    }


def bench_stream(cfg: ObsConfig, n_blocks: int = 16, n_distinct: int = 4,
                 depth: int = 4) -> dict:
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    blocks = [make_random_bytes_block(cfg, seed=s) for s in range(n_distinct)]
    # Warm-up run compiles and primes transfers.
    run_stream(cfg, qw, SyntheticSource(cfg, blocks, n_blocks=2), depth=depth)
    src = SyntheticSource(cfg, blocks, n_blocks=n_blocks)
    stats = run_stream(cfg, qw, src, depth=depth)
    rec = stats.record(cfg)
    rec["mode"] = "stream"
    rec["ms_per_block"] = stats.wall_s / max(stats.n_blocks, 1) * 1e3
    return rec


def run_benchmark(cfg: ObsConfig, n_blocks: int = 16,
                  mode: str = "stream") -> dict:
    if mode == "kernel":
        return bench_kernel(cfg, n_blocks=n_blocks)
    return bench_stream(cfg, n_blocks=n_blocks)
