"""Isolate the fused-SK kernel's +44 ms/block cost (measured 2026-08-19,
measure_rfi.json: fused +132% vs standalone +40%).  Runs ONE variant per
process (the kernel body reads DSABF_SK_EXP at trace time):

  base      no SK (control)
  sk        current fused path (column-scalar .sum() time reduction)
  noscalar  SK minus the two full-column scalar reduces (wrong values)
  mxu       time reduction as a [1, P*tt] MXU dot (candidate fix)

Subband geometry (n_chan=256, everything else deployed-scale) keeps the
remote Mosaic compile ~30 s so variants iterate quickly; the SK cost is
per-channel work, so the delta scales linearly to the full band.

  DSABF_SK_EXP=mxu PYTHONPATH=/root/.axon_site:/root/repo \
      /opt/venv/bin/python scripts/exp_sk_cost.py sk
"""
import json
import os
import sys
import time

import numpy as np
import jax

from dsabeamformer_tpu.utils.hostenv import enable_jax_cache
enable_jax_cache()
from dsabeamformer_tpu.config import DSA10
from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
from dsabeamformer_tpu.models.weights import make_weights
from dsabeamformer_tpu.ops import beamform_power
from dsabeamformer_tpu.ops.quantize import prepare_weights
from dsabeamformer_tpu.utils.bench import _digest

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
sk = variant != "base"
cfg = DSA10.replace(n_chan=256)
wire = make_random_bytes_block(cfg, seed=3)
qw = prepare_weights(cfg, make_weights(cfg))
dev = jax.device_put(wire.reshape(cfg.device_wire_shape))

kw = dict(sk_stats=True) if sk else {}
res = beamform_power(dev, qw, cfg, **kw)
out = res[0] if isinstance(res, tuple) else res
float(_digest(out))

best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(16):
        res = beamform_power(dev, qw, cfg, **kw)
        out = res[0] if isinstance(res, tuple) else res
    float(_digest(out))
    if sk:
        np.asarray(res[1])
    best = min(best, (time.perf_counter() - t0) / 16)

print(json.dumps({
    "variant": variant,
    "exp": os.environ.get("DSABF_SK_EXP", ""),
    "n_chan": cfg.n_chan,
    "ms_per_block": round(best * 1e3, 3),
}))
