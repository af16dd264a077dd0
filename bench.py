#!/usr/bin/env python
"""North-star benchmark — prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric (BASELINE.json): sustained real-time factor beamforming the full
DSA-10 band (64 ant, 256 beams, 2048 chan, dual pol, 4R4I wire format)
on ONE chip — unpack + int8 complex GEMM + |B|^2 + 16x time averaging,
all in the fused Pallas kernel.

The measured configuration is the DEPLOYED default: the unmodified
DSA10 preset — time-major 'tfpa' wire order (what the capture stage
produces) consumed directly by the kernel (the corner-turn happens in
the Pallas grid/DMA + an in-kernel 128-aligned lane slice; it is never
materialized), int8x2 weights (the mode that meets the <=1e-3 accuracy
bar on every input class, including the point-source sidelobe-floored
metric), t_block=8192 samples (dispatch-overhead amortization,
BENCH.md).

value = (seconds of telescope data processed) / (wall seconds).
Timing methodology: blocks resident in HBM, n back-to-back dispatches
of the block step (one dispatch per block — exactly the streaming
driver's shape) closed by a scalar-digest fetch (block_until_ready does
not reliably fence on this CI TPU's relay runtime; its host<->device
link, ~0.4 GB/s H2D / ~0.03 GB/s D2H, is orders of magnitude below a
real v5e host's PCIe, so device-resident throughput is the honest
per-chip capability; `dsabf bench --bench-mode stream` measures the
end-to-end ingest path).

vs_baseline: the reference CUDA pipeline was ~order-1x real time per
GPU on its 1/8-band subband (BASELINE.md [K]); we credit it a full 1x
real-time FULL-BAND factor per device (8x generous) and report
value / 1.0.

Extended diagnostics go to stderr; stdout carries exactly one line.
"""

import json
import sys
import time


def main() -> int:
    import jax

    from dsabeamformer_tpu.utils.hostenv import enable_jax_cache

    # Persistent compilation cache: repeated driver/bench runs skip the
    # multi-minute remote Mosaic compile.
    enable_jax_cache()

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
    from dsabeamformer_tpu.models.weights import make_weights
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.utils.metrics import mxu_utilization_both

    cfg = DSA10  # the deployed default, unmodified
    n_blocks = 16

    print(f"[bench] backend={jax.default_backend()} "
          f"devices={jax.devices()}", file=sys.stderr)
    print(f"[bench] config: mode={cfg.weight_mode} wire={cfg.input_layout} "
          f"t_block={cfg.t_block} a_compute={cfg.a_compute}",
          file=sys.stderr)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    blocks = [
        jax.device_put(device_wire_view(make_random_bytes_block(cfg, seed=s),
                                        cfg))
        for s in range(2)
    ]

    @jax.jit
    def digest(x):
        return x.sum()

    t0 = time.perf_counter()
    d = float(digest(beamform_power(blocks[0], qw, cfg)))
    print(f"[bench] compile+warm {time.perf_counter() - t0:.1f}s "
          f"digest={d:.3e}", file=sys.stderr)

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(n_blocks):
            out = beamform_power(blocks[i % 2], qw, cfg)
        float(digest(out))
        dt = (time.perf_counter() - t0) / n_blocks
        best = min(best, dt)
        print(f"[bench] rep {rep}: {dt * 1e3:.2f} ms/block", file=sys.stderr)

    rt = cfg.block_duration_s / best
    gbs = cfg.wire_block_bytes / best / 1e9
    # Dual accounting (BENCH.md) via the ONE shared helper the driver
    # stats line and `dsabf bench` also use: issued-MACs (sliced K the
    # kernel dispatches) vs the reference's padded-K formulation.
    util = mxu_utilization_both(
        cfg.macs_per_block * cfg.n_weight_terms, best, cfg)
    util_s = "n/a" if util is None else (
        f"{100 * util['issued']:.1f}% issued-MACs "
        f"({100 * util['padded_k']:.1f}% in the reference's padded-K "
        f"accounting)"
    )
    print(
        f"[bench] {best * 1e3:.2f} ms/block | {gbs:.1f} GB/s wire | "
        f"{rt:.2f}x realtime | MXU {util_s}",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "dsa10_fullband_realtime_factor_1chip",
        "value": round(rt, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rt / 1.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
