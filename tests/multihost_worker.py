"""One process of an n-process CPU 'pod' (spawned by test_multihost.py).

Exercises the REAL multi-host runtime path (parallel/multihost.py):
``initialize_multihost`` -> ``my_subband`` -> per-host subband capture
-> ``jax.make_array_from_process_local_data`` assembly of the global
channel-sharded arrays -> the global ``sharded_beamformer`` step ->
per-host golden check of the addressable output shards.  This is the
TPU-pod deployment shape (each host DMAs only its own subband; DCN
carries no voltage data) executed on n processes x m CPU devices.

argv: coordinator n_proc pid devices_per_proc preset(tiny|dsa110s)
"""

import sys


def _preset(name: str):
    from dsabeamformer_tpu.config import DSA110, TINY

    if name == "tiny":
        return TINY
    if name == "dsa110s":
        # The DSA-110 deployment structure (128-ant K dim, 2048-total
        # band frame) at test scale: 16 channels over the 8-slot global
        # mesh (4 hosts x 2 devices), reduced beams/time for speed.
        return DSA110.replace(
            n_chan=16, n_chan_total=2048, t_block=64, time_tile=32,
            chan_tile=2, n_beams=64,
        )
    raise SystemExit(f"unknown preset {name!r}")


def main() -> int:
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    n_dev = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    preset = sys.argv[5] if len(sys.argv) > 5 else "tiny"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)

    from dsabeamformer_tpu.parallel.multihost import (
        initialize_multihost,
        my_subband,
    )

    initialize_multihost(coord, n_proc, pid)
    assert jax.process_count() == n_proc, jax.process_count()

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import (
        make_weights,
        weights_numpy_golden,
    )
    from dsabeamformer_tpu.ops.quantize import QuantWeights, quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.parallel.sharding import (
        AXIS,
        make_mesh,
        sharded_beamformer,
        sharded_wire_sharding,
    )
    from dsabeamformer_tpu.utils.testing import relative_power_error

    cfg = _preset(preset)
    mesh = make_mesh(len(jax.devices()))
    sub = my_subband(cfg)

    # The capture fan-out: the full-band block is deterministic, each
    # host "receives" only its subband slice and stages it in the
    # canonical device form ([T, F_local*P*A] for tfpa wire).
    wire = np.asarray(make_noise_block(cfg, rms=2.0, seed=9))
    pa = cfg.n_pol * cfg.n_ant
    local_wire = np.ascontiguousarray(
        wire[:, sub.chan_start : sub.chan_start + sub.n_chan]
    ).reshape(cfg.t_block, sub.n_chan * pa)
    wire_sh = jax.make_array_from_process_local_data(
        sharded_wire_sharding(cfg, mesh), local_wire
    )

    # Weights are a pure function of config -> each host computes the
    # full table and contributes its channel slice.
    qw_full = quantize_weights(make_weights(cfg), cfg.weight_mode,
                               cfg.a_compute)
    scales = np.asarray(qw_full.scales)
    sl = slice(sub.chan_start, sub.chan_start + sub.n_chan)
    term_sharding = NamedSharding(mesh, P(AXIS, None, None))
    qw = QuantWeights(
        terms=tuple(
            jax.make_array_from_process_local_data(
                term_sharding, np.asarray(t)[sl]
            )
            for t in qw_full.terms
        ),
        scales=jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(AXIS, None)), scales[sl]
        ),
    )

    step = sharded_beamformer(cfg, mesh, with_band_power=True)
    powers, band = step(wire_sh, qw)

    ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time,
        cfg.navg_freq,
    )
    for shard in powers.addressable_shards:
        err = relative_power_error(np.asarray(shard.data), ref[shard.index])
        assert err <= 1e-3, f"proc {pid} shard {shard.index}: {err:.3e}"
    # Band power is the psum across the channel axis -> replicated.
    np.testing.assert_allclose(
        np.asarray(band), ref.sum(axis=(0, 2)), rtol=1e-4
    )
    print(f"proc {pid} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
