#!/usr/bin/env python
"""Incoherent-product cost at the DSA10 preset (VERDICT r2 #5):
(a) fused kernel power-only, (b) fused power+incoherent (one HBM pass),
(c) power + the standalone XLA incoherent pass (second full read of the
2.1 GB wire block).  Same session, back-to-back.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo nohup /opt/venv/bin/python \
      scripts/measure_incoherent.py > /tmp/inco.jsonl 2>/tmp/inco.log &
"""

import json
import sys
import time


def main() -> int:
    import numpy as np

    import jax

    from dsabeamformer_tpu.utils.hostenv import enable_jax_cache, require_tpu_backend

    enable_jax_cache()
    if not require_tpu_backend():
        return 1

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
    from dsabeamformer_tpu.models.weights import make_weights
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.incoherent import incoherent_power
    from dsabeamformer_tpu.ops.quantize import quantize_weights

    cfg = DSA10
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    blocks = [
        jax.device_put(device_wire_view(make_random_bytes_block(cfg, seed=s),
                                        cfg))
        for s in range(2)
    ]

    @jax.jit
    def digest(x):
        return x.sum()

    def timed(fn, label, n=8, reps=2):
        out = fn(blocks[0])
        # Fence warm-up/compile.
        leaves = jax.tree_util.tree_leaves(out)
        for lf in leaves:
            float(digest(lf))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(blocks[i % 2])
            for lf in jax.tree_util.tree_leaves(out):
                float(digest(lf))
            best = min(best, (time.perf_counter() - t0) / n)
        print(json.dumps({"label": label, "ms_per_block": best * 1e3,
                          "realtime": cfg.block_duration_s / best}),
              flush=True)
        return best

    t_a = timed(lambda b: beamform_power(b, qw, cfg), "power_only")
    # Isolate the incoherent variant's tile halving from its epilogue
    # cost: power-only at the halved tile.
    cfg_h = cfg.replace(time_tile=cfg.time_tile // 2)
    timed(lambda b: beamform_power(b, qw, cfg_h), "power_only_tt_halved")
    t_b = timed(lambda b: beamform_power(b, qw, cfg, incoherent=True),
                "power_fused_incoherent")
    t_c = timed(lambda b: (beamform_power(b, qw, cfg),
                           incoherent_power(b, cfg)),
                "power_plus_standalone_incoherent")
    print(json.dumps({
        "fused_overhead_ms": (t_b - t_a) * 1e3,
        "standalone_overhead_ms": (t_c - t_a) * 1e3,
        "fused_saving_ms": (t_c - t_b) * 1e3,
    }), flush=True)

    # Full-Stokes at the deployment tiles the CLI derives for this
    # preset (shrink_tiles -> fc=4/tt=1024): stokes alone vs stokes +
    # fused incoherent — the full-scale Mosaic proof of the five-plane
    # kernel.  Each Stokes output is 4.3 GB and this CI chip exposes
    # roughly half a v5e's HBM (a second in-flight output OOMs,
    # measured), so: ONE wire block resident, fence per dispatch, and
    # free each output before the next.  The ~2 ms fence cost is small
    # against the stokes block time and identical between the two rows
    # being compared.
    from dsabeamformer_tpu.config import shrink_tiles
    from dsabeamformer_tpu.ops.gemm import beamform_stokes

    cfg_st = shrink_tiles(
        cfg, lambda fc, tt: fc * (tt // cfg.navg_time) * 4 * cfg.n_beams * 4,
        2 ** 20, min_time_tile=1024)
    del blocks[1]  # reclaim HBM for the 4.3 GB Stokes output

    def timed_fenced(fn, label, n=4, reps=2):
        def one():
            out = fn(blocks[0])
            for lf in jax.tree_util.tree_leaves(out):
                float(digest(lf))
            del out  # free the 4.3 GB output before the next dispatch

        one()  # warm-up/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                one()
            best = min(best, (time.perf_counter() - t0) / n)
        print(json.dumps({"label": label, "ms_per_block": best * 1e3,
                          "realtime": cfg.block_duration_s / best,
                          "fenced": True}), flush=True)
        return best

    t_d = timed_fenced(lambda b: beamform_stokes(b, qw, cfg_st),
                       "stokes_only_fc4_tt1024")
    t_e = timed_fenced(
        lambda b: beamform_stokes(b, qw, cfg_st, incoherent=True),
        "stokes_fused_incoherent")
    print(json.dumps({"stokes_fused_overhead_ms": (t_e - t_d) * 1e3}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
