"""Measure the streaming SK monitor's per-block cost at the deployed
DSA-10 preset: dispatch-loop time with and without sk_block_stats
riding each block (the --rfi-auto default, sample=1)."""
import time, json
import numpy as np, jax
from dsabeamformer_tpu.utils.hostenv import enable_jax_cache, require_tpu_backend
enable_jax_cache()
from dsabeamformer_tpu.config import DSA10
from dsabeamformer_tpu.models.weights import make_weights
from dsabeamformer_tpu.ops.quantize import prepare_weights
from dsabeamformer_tpu.ops import beamform_power
from dsabeamformer_tpu.ops.incoherent import sk_block_stats
from dsabeamformer_tpu.ingest.generator import make_noise_block
from dsabeamformer_tpu.utils.bench import _digest

assert require_tpu_backend()
cfg = DSA10
wire = make_noise_block(cfg, rms=2.0, seed=3)
qw = prepare_weights(cfg, make_weights(cfg))
dev = jax.device_put(wire.reshape(cfg.device_wire_shape))
# compile both
np.asarray(beamform_power(dev, qw, cfg))
st = sk_block_stats(dev, cfg); np.asarray(st["s1"])

def loop(with_sk, n=8, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = beamform_power(dev, qw, cfg)
            if with_sk:
                st = sk_block_stats(dev, cfg)
        float(_digest(out))
        if with_sk:
            np.asarray(st["s1"])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3

base = loop(False); sk = loop(True)
print(json.dumps({"ms_per_block_base": base, "ms_per_block_with_sk": sk,
                  "sk_overhead_ms": sk - base,
                  "overhead_pct": 100 * (sk - base) / base}))
