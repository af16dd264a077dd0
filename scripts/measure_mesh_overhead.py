"""Bound the mesh-driver overhead on the real chip (VERDICT r4 #7): the
DSA-110 "≈4.9x aggregate" arithmetic inherits a measured per-process
cost term instead of pure extrapolation.

Two comparisons, both 1-device mesh vs plain, DSA-10 preset:

1. **Dispatch level** (device-resident, the headline methodology):
   ``beamform_power`` direct vs the ``sharded_beamformer`` shard_map
   step on a ``make_mesh(1)`` mesh — isolates the shard_map dispatch
   fan-out cost per block.
2. **Driver level** (SyntheticSource through the real drivers at a
   1/8-band subband — 268 MB blocks keep the CI relay's ~0.4 GB/s H2D
   from drowning the ms-scale delta): ``StreamingBeamformer`` vs
   ``MeshStreamingBeamformer`` wall time per block, which adds the
   sharded ``device_put`` and assembled-drain costs.

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python scripts/measure_mesh_overhead.py
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
from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
from dsabeamformer_tpu.ops.quantize import prepare_weights
from dsabeamformer_tpu.parallel.sharding import make_mesh, sharded_beamformer
from dsabeamformer_tpu.pipeline import (
    MeshStreamingBeamformer,
    StreamingBeamformer,
    SyntheticSource,
)
from dsabeamformer_tpu.utils.bench import _digest

assert require_tpu_backend()
out = {}

# --- 1. dispatch-level: plain kernel vs 1-device shard_map step -------
cfg = DSA10
mesh = make_mesh(1)
wire = device_wire_view(make_random_bytes_block(cfg, seed=3), cfg)
dev = jax.device_put(wire)
qw = prepare_weights(cfg, make_weights(cfg))
step = sharded_beamformer(cfg, mesh)

t0 = time.perf_counter()
float(_digest(beamform_power(dev, qw, cfg)))
print(f"[mesh] plain compile {time.perf_counter()-t0:.0f}s", file=sys.stderr)
t0 = time.perf_counter()
float(_digest(step(dev, qw)))
print(f"[mesh] sharded compile {time.perf_counter()-t0:.0f}s",
      file=sys.stderr)


def loop(fn, n=8, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        float(_digest(o))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


ms_plain = loop(lambda: beamform_power(dev, qw, cfg))
ms_mesh = loop(lambda: step(dev, qw))
out["dispatch"] = {
    "config": cfg.name, "t_block": cfg.t_block,
    "ms_plain": round(ms_plain, 2), "ms_mesh1": round(ms_mesh, 2),
    "overhead_ms": round(ms_mesh - ms_plain, 2),
    "overhead_pct": round(100 * (ms_mesh - ms_plain) / ms_plain, 1),
}
print(f"[mesh] dispatch: plain {ms_plain:.2f} vs mesh1 {ms_mesh:.2f} "
      f"ms/block", file=sys.stderr)

# --- 2. driver-level at a 1/8-band subband (relay-sized blocks) -------
sub = DSA10.replace(n_chan=256)
qw_s = prepare_weights(sub, make_weights(sub))
blocks = [np.asarray(make_random_bytes_block(sub, seed=s))
          for s in (1, 2)]
n_blocks = 8
rows = {}
for name, mk in (
    ("plain", lambda src: StreamingBeamformer(sub, qw_s, src)),
    ("mesh1", lambda src: MeshStreamingBeamformer(sub, qw_s, src,
                                                  mesh=make_mesh(1))),
):
    bf = mk(SyntheticSource(sub, blocks, n_blocks))
    bf.warmup()
    t0 = time.perf_counter()
    stats = bf.run()
    wall = time.perf_counter() - t0
    rows[name] = wall / n_blocks * 1e3
    print(f"[mesh] driver {name}: {rows[name]:.2f} ms/block "
          f"(rt {stats.realtime_factor(sub):.2f})", file=sys.stderr)

out["driver_subband"] = {
    "config": f"{sub.name} n_chan=256", "t_block": sub.t_block,
    "n_blocks": n_blocks,
    "ms_plain": round(rows["plain"], 2),
    "ms_mesh1": round(rows["mesh1"], 2),
    "overhead_ms": round(rows["mesh1"] - rows["plain"], 2),
    "note": "relay-bound H2D (~0.4 GB/s) included in both; the DELTA "
            "is the sharded put + assembled drain cost",
}
print(json.dumps(out))
