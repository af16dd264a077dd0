import time, json
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/tmp/dsabf-jax-cache')
from dsabeamformer_tpu.config import DSA10
from dsabeamformer_tpu.models.weights import make_weights
from dsabeamformer_tpu.ops.quantize import prepare_weights
from dsabeamformer_tpu.ops import beamform_power
from dsabeamformer_tpu.ingest.generator import make_noise_block
from dsabeamformer_tpu.ingest.sigproc import FilterbankSink

cfg = DSA10.replace(n_chan=256, t_block=2048, time_tile=1024)
wire = make_noise_block(cfg, rms=2.0, seed=3)
qw = prepare_weights(cfg, make_weights(cfg))
dev = jax.device_put(wire.reshape(cfg.device_wire_shape))
sink = FilterbankSink('/tmp/fil8m', cfg, beams=[0], nbits=8, scale=0.02)
# warm/compile both paths
np.asarray(beamform_power(dev, qw, cfg))
np.asarray(sink.device_post(beamform_power(dev, qw, cfg)))

q8 = sink.fused_quant8_scales()
assert q8 is not None
np.asarray(beamform_power(dev, qw, cfg, quant8_scales=q8))  # compile fused

def t_path(mode, reps=4):
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        if mode == 'fused':
            x = beamform_power(dev, qw, cfg, quant8_scales=q8)
        else:
            x = beamform_power(dev, qw, cfg)    # fresh dispatch
            if mode == 'post':
                x = sink.device_post(x)
        np.asarray(x)                            # real D2H of a fresh array
        best = min(best, time.perf_counter() - t0)
    return best

t32 = t_path('f32'); t8 = t_path('post'); tf = t_path('fused')
f32_mb = 256*128*256*4/2**20
print(json.dumps({"f32_mb": f32_mb, "kernel_plus_fetch_f32_ms": t32*1e3,
                  "kernel_plus_fetch_u8_ms": t8*1e3,
                  "kernel_plus_fetch_fused_u8_ms": tf*1e3,
                  "d2h_saving_ms": (t32-t8)*1e3,
                  "fused_saving_vs_post_ms": (t8-tf)*1e3}))
sink.close()
