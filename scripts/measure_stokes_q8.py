"""Full-Stokes realtime factor with the round-5 lever: in-epilogue
uint8 IQUV quantization (``beamform_stokes(quant8_scales=...)``).

Round-4 state (BENCH.md "Full-Stokes mode"): f32 Stokes was 17.0 ms per
2048-sample block = 0.99x realtime at t_block=4096 — the cost is the 4x
f32 output block (4.3 GB/block at t_block=8192; 2.1 GB at 4096) paying
HBM write + D2H fetch.  The fused uint8 epilogue stores 1 byte/sample
(16x less output HBM than f32 x 4 planes), byte-identical to the
two-pass sink quantizer (tests/test_stokes.py, test_tpu_hw.py).

This script measures both variants back-to-back at t_block=4096 (the
deployable Stokes block size) on the DSA-10 full band, dispatch-loop
methodology (BENCH.md Methodology).

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python scripts/measure_stokes_q8.py
"""
import json
import sys
import time

import numpy as np
import jax

from dsabeamformer_tpu.utils.hostenv import enable_jax_cache, require_tpu_backend
enable_jax_cache()
from dsabeamformer_tpu.config import DSA10
from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
from dsabeamformer_tpu.models.weights import make_weights
from dsabeamformer_tpu.ops.gemm import beamform_stokes, device_wire_view
from dsabeamformer_tpu.ops.quantize import prepare_weights
from dsabeamformer_tpu.utils.bench import _digest

assert require_tpu_backend()
cfg = DSA10.replace(t_block=4096, time_tile=1024, chan_tile=4)
wire = device_wire_view(make_random_bytes_block(cfg, seed=3), cfg)
qw = prepare_weights(cfg, make_weights(cfg))
dev = jax.device_put(wire)

# Auto-cal-style per-beam scales from the f32 block (what the sink's
# first-block calibration would produce).
t0 = time.perf_counter()
f32 = beamform_stokes(dev, qw, cfg)
print(f"[stokes] f32 compile+warm {time.perf_counter()-t0:.0f}s",
      file=sys.stderr)
med = np.median(np.asarray(f32)[:, :, 0, :], axis=(0, 1))
scales = jax.device_put((64.0 / med).astype(np.float32))
t0 = time.perf_counter()
float(_digest(beamform_stokes(dev, qw, cfg, quant8_scales=scales)))
print(f"[stokes] q8 compile+warm {time.perf_counter()-t0:.0f}s",
      file=sys.stderr)


def loop(kw, n=8, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = beamform_stokes(dev, qw, cfg, **kw)
        float(_digest(out))  # scalar fetch = execution fence
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


ms_f32 = loop({})
print(f"[stokes] f32: {ms_f32:.2f} ms/block", file=sys.stderr)
ms_q8 = loop({"quant8_scales": scales})
print(f"[stokes] fused-q8: {ms_q8:.2f} ms/block", file=sys.stderr)

blk_ms = cfg.block_duration_s * 1e3
print(json.dumps({
    "config": cfg.name,
    "t_block": cfg.t_block,
    "block_sky_ms": round(blk_ms, 2),
    "ms_f32": round(ms_f32, 2),
    "realtime_f32": round(blk_ms / ms_f32, 3),
    "ms_fused_q8": round(ms_q8, 2),
    "realtime_fused_q8": round(blk_ms / ms_q8, 3),
    "q8_saving_ms": round(ms_f32 - ms_q8, 2),
}))
