"""Measure the streaming SK monitor's per-block cost at the deployed
DSA-10 preset, three ways: bare block step, step + the STANDALONE
sk_block_stats pass (the offline-scan / legacy observe() cost), and
the FUSED kernel that emits the accumulators itself
(beamform_power(sk_stats=True) — the --rfi-auto run path)."""
import time, json
import numpy as np, jax
from dsabeamformer_tpu.utils.hostenv import enable_jax_cache, require_tpu_backend
enable_jax_cache()
from dsabeamformer_tpu.config import DSA10
from dsabeamformer_tpu.models.weights import make_weights
from dsabeamformer_tpu.ops.quantize import prepare_weights
from dsabeamformer_tpu.ops import beamform_power
from dsabeamformer_tpu.ops.incoherent import sk_block_stats
from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
from dsabeamformer_tpu.utils.bench import _digest

assert require_tpu_backend()
cfg = DSA10
wire = make_random_bytes_block(cfg, seed=3)
qw = prepare_weights(cfg, make_weights(cfg))
dev = jax.device_put(wire.reshape(cfg.device_wire_shape))
# compile all three variants
np.asarray(beamform_power(dev, qw, cfg))
st0 = sk_block_stats(dev, cfg); np.asarray(st0["s1"])
pf, skf = beamform_power(dev, qw, cfg, sk_stats=True); np.asarray(skf)


def loop(mode, n=8, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st = None
        for _ in range(n):
            if mode == "fused":
                out, st = beamform_power(dev, qw, cfg, sk_stats=True)
            else:
                out = beamform_power(dev, qw, cfg)
                if mode == "standalone":
                    st = sk_block_stats(dev, cfg)
        float(_digest(out))
        if mode == "standalone":
            np.asarray(st["s1"])
        elif mode == "fused":
            np.asarray(st)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


base = loop("base")
sk = loop("standalone")
fused = loop("fused")
print(json.dumps({
    "ms_per_block_base": base,
    "ms_per_block_standalone_sk": sk,
    "ms_per_block_fused_sk": fused,
    "standalone_overhead_ms": sk - base,
    "fused_overhead_ms": fused - base,
    "standalone_overhead_pct": 100 * (sk - base) / base,
    "fused_overhead_pct": 100 * (fused - base) / base,
}))
