#!/usr/bin/env python
"""Full-scale soak (VERDICT r2 #8): the real `dsa10` geometry —
t_block=8192, 2.1 GB wire blocks — through the real dsaring +
StreamingBeamformer stack, validating the host-RAM sizing claims in
`dsabf info` (host_staging_bytes_depth2) and flat RSS at production
block size.  The TINY-config soak (tests/test_soak.py) proves the
steady-state logic at 10^4 blocks; this proves the same properties
hold when every buffer is 2.1 GB.

Backends (``DSABF_SOAK_BACKEND``, default ``cpu``):

- ``cpu`` — the RSS-validation mode.  Full-size blocks flow through
  the real ring -> staging pool -> device_put path on the CPU backend;
  the detection kernel is replaced by a jitted digest (interpret-mode
  Pallas at 2 GiB/block is infeasible, and the kernel's steady-state
  memory behavior is already proven by the 10^4-block TINY soak and
  the TPU dispatch-loop benchmarks — what full size adds is the 2 GiB
  buffer lifecycle, which this mode exercises exactly).
- ``tpu`` — the real kernel end-to-end.  CAUTION: this CI's axon
  relay client leaks every H2D transfer on the HOST (measured
  2026-08-17: a bare ``jax.device_put`` loop of 512 MB arrays grows
  RssAnon by exactly 512 MB/iteration after del+gc; CPU backend is
  flat, so the pipeline's staging is exonerated).  At 2.1 GB/block the
  host OOMs near block ~25 — cap DSABF_SOAK_BLOCKS<=12 here.  Real
  deployments (local PCIe TPU runtime, no relay) do not have this
  client; BENCH.md "Memory stability" carries the analysis.

  PYTHONPATH=/root/.axon_site:/root/repo nohup /opt/venv/bin/python \
      scripts/soak_fullsize.py > /tmp/soak_full.jsonl 2>/tmp/soak_full.log &
(the TPU relay registers via sitecustomize on PYTHONPATH — replacing
PYTHONPATH silently drops to the CPU backend)

Prints one JSON summary line: blocks, drops, rss_mb at start/early/end.
"""

import json
import sys
import threading
import time
import uuid


from dsabeamformer_tpu.utils.hostenv import (  # noqa: E402
    enable_jax_cache,
    process_rss_mb as _rss_mb,
    require_tpu_backend,
)


def main() -> int:
    import os

    import numpy as np

    import jax

    backend = os.environ.get("DSABF_SOAK_BACKEND", "cpu")
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    enable_jax_cache()
    if backend == "tpu" and not require_tpu_backend():
        return 1

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest import dada
    from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
    from dsabeamformer_tpu.ingest.ring import RingBuffer
    from dsabeamformer_tpu.models.weights import make_weights
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.pipeline import RingSource, StreamingBeamformer

    cfg = DSA10
    n_blocks = int(os.environ.get("DSABF_SOAK_BLOCKS", "60"))
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    blocks = [make_random_bytes_block(cfg, seed=s) for s in range(2)]
    rss0 = _rss_mb()
    print(f"[soak] wire_block={cfg.wire_block_bytes / 2**30:.2f} GiB, "
          f"rss after sources={rss0:.0f} MB", file=sys.stderr)

    name = f"soakfull-{uuid.uuid4().hex[:8]}"
    rss = {"start": rss0}
    with RingBuffer(name, create=True, nbufs=4,
                    bufsz=cfg.wire_block_bytes) as ring:
        ring.write_header(dada.encode_header(cfg))
        # depth+2 = 4 staging buffers — the exact pool cmd_run sizes
        # for >=512 MiB blocks (the configuration whose RSS this soak
        # validates; the default 8-buffer pool would double it).
        source = RingSource(cfg, RingBuffer(name), timeout_s=120.0,
                            n_host_buffers=4)

        # No sink: the driver drains with its jitted scalar-digest fetch
        # (pipeline._drain_one).  A full-output sink would pull 537 MB
        # per block through this CI's ~0.03 GB/s D2H relay link
        # (measured: it dominates at ~2 min/block) — the soak validates
        # host staging + RSS, not the relay.
        def on_block(bs):
            if bs.block_idx == 5:
                rss["early"] = _rss_mb()
            if bs.block_idx % 10 == 0:
                print(f"[soak] block {bs.block_idx} wall={bs.wall_s:.2f}s "
                      f"rss={_rss_mb():.0f} MB dropped={bs.dropped}",
                      file=sys.stderr)

        bf = StreamingBeamformer(cfg, qw, source, sink=None, depth=2,
                                 on_block=on_block)
        if backend == "cpu":
            # Null-compute digest stands in for the Pallas kernel (see
            # module docstring) — the full 2.1 GiB block still flows
            # ring -> staging -> device_put; only the detect math is
            # replaced, so RSS reflects the real buffer lifecycle.
            import jax.numpy as jnp

            @jax.jit
            def _null_step(wire_dev):
                return jnp.sum(wire_dev[::4096].astype(jnp.float32))

            bf._step = lambda wire_dev: (_null_step(wire_dev), None)
        t0 = time.perf_counter()
        bf.warmup()
        print(f"[soak] warmup {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        # Pace the producer at ~1.3x the measured consumer block time so
        # the sustained rate is sub-realtime for THIS environment (the
        # CI link is far below a real capture NIC; drops would only
        # measure the relay, not the driver).
        t0 = time.perf_counter()
        ring.write_block(blocks[0])

        def produce(pace_s):
            for i in range(2, n_blocks):
                ring.write_block(blocks[i % 2])
                time.sleep(pace_s)
            ring.set_eod()

        # Measure two blocks end-to-end (ring read + H2D + kernel +
        # digest fence); calibrate pace on the SECOND — the first pays
        # one-time page faults on the 2 GiB ring/staging buffers and
        # over-paces the run by ~10x.
        from dsabeamformer_tpu.pipeline import _digest

        for cal_i in range(2):
            if cal_i:
                t0 = time.perf_counter()
                ring.write_block(blocks[1])
            item = source.read_block()
            assert item is not None
            seq, wire = item
            dev = jax.device_put(wire.reshape(cfg.device_wire_shape))
            out, _ = bf._step(dev)
            float(_digest(out))
        pace = max(1.3 * (time.perf_counter() - t0), 0.5)
        print(f"[soak] calibrated pace {pace:.2f}s/block", file=sys.stderr)

        t = threading.Thread(target=produce, args=(pace,), daemon=True)
        t.start()
        stats = bf.run(max_blocks=n_blocks - 2)
        t.join(timeout=300)

    rss["end"] = _rss_mb()
    summary = {
        "config": cfg.name,
        "wire_gib": round(cfg.wire_block_bytes / 2**30, 2),
        "blocks": stats.n_blocks + 2,  # + the two calibration blocks
        "dropped": stats.dropped,
        "skipped": stats.skipped,
        "ms_per_block": round(stats.wall_s / max(stats.n_blocks, 1) * 1e3, 1),
        "rss_mb": {k: round(v, 1) for k, v in rss.items()},
        "rss_growth_early_to_end_mb": round(rss["end"] - rss.get("early", rss0), 1),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
