#!/usr/bin/env python
"""int12 accuracy at DSA-110 geometry (VERDICT r2 #3): the one-pass
x16-fold mode measured 0.622x vs int8x2's 0.581x at DSA-110, but its
accuracy class was only ever measured at DSA-10 (10 coherent paths).
110 coherent paths change the sidelobe floor the point-source metric
divides by, so the class must be measured, not assumed.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python \
      scripts/measure_dsa110_int12.py
Prints one JSON line per (mode, input-class) with the relative power
error vs the float64 golden.
"""

import json
import sys


def main() -> int:
    import numpy as np

    import jax

    from dsabeamformer_tpu.utils.hostenv import enable_jax_cache, require_tpu_backend

    enable_jax_cache()
    if not require_tpu_backend():
        return 1

    from dsabeamformer_tpu.config import DSA110
    from dsabeamformer_tpu.ingest.generator import (
        make_noise_block,
        make_point_source_block,
    )
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import relative_power_error

    base = DSA110.replace(n_chan=64, t_block=1024)
    target = 300
    for mode in ("int8x2", "int12"):
        cfg = base.replace(weight_mode=mode)
        qw = quantize_weights(make_weights(cfg), mode, cfg.a_compute)
        golden_w = weights_numpy_golden(cfg)
        for klass, wire in (
            ("point_source",
             make_point_source_block(cfg, cfg.beam_angles_rad()[target],
                                     noise_rms=0.4, seed=7)),
            ("noise", make_noise_block(cfg, rms=2.0, seed=3)),
        ):
            p = np.asarray(beamform_power(
                jax.device_put(device_wire_view(wire, cfg)), qw, cfg
            ))
            ref = beamform_block_ref(golden_w, wire, cfg.input_layout,
                                     cfg.navg_time, cfg.navg_freq)
            err = relative_power_error(p, ref)
            peak_ok = (int(np.argmax(p.sum(axis=(0, 1)))) == target
                       if klass == "point_source" else None)
            print(json.dumps({
                "mode": mode, "class": klass, "rel_power_error": float(err),
                "peak_at_target": peak_ok, "bar": 1e-3,
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
