"""Hardware-only end-to-end checks.

Skipped on the CPU test backend; run them on a machine with a real TPU:

    JAX_PLATFORMS='' DSABF_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q --no-header -p no:cacheprovider

(The main suite forces the CPU backend in conftest.py; this file opts
out of that via the env flag so the same tests can gate a TPU CI.)
"""

import os

import numpy as np
import pytest

RUN = os.environ.get("DSABF_TPU_TESTS") == "1"

pytestmark = pytest.mark.skipif(
    not RUN, reason="set DSABF_TPU_TESTS=1 on a TPU machine"
)


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    from dsabeamformer_tpu.utils.hostenv import enable_jax_cache

    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend in this process")
    # Persistent compile cache: without it every gate re-pays the
    # 1-5 min remote Mosaic compile per kernel shape.
    enable_jax_cache()
    return jax.default_backend()


def test_fused_kernel_accuracy_on_tpu(tpu_backend):
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_point_source_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024)
    angles = cfg.beam_angles_rad()
    target = 77
    wire = make_point_source_block(cfg, angles[target], noise_rms=0.4, seed=7)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    p = np.asarray(beamform_power(jax.device_put(wire), qw, cfg))
    assert int(np.argmax(p.sum(axis=(0, 1)))) == target
    p_ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time
    )
    assert relative_power_error(p, p_ref) <= POWER_RTOL


def test_int12_fast_mode_on_tpu(tpu_backend):
    """The x16-folded one-pass mode: <=1e-3 on its noise-block gate and
    the beam peak in the right place (see BENCH.md for why int8x2 stays
    the default under the point-source sidelobe metric)."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024,
                        weight_mode="int12")
    wire = make_noise_block(cfg, rms=2.0, seed=3)
    qw = quantize_weights(make_weights(cfg), "int12", cfg.a_compute)
    p = np.asarray(beamform_power(jax.device_put(wire), qw, cfg))
    p_ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time
    )
    assert relative_power_error(p, p_ref) <= POWER_RTOL


def test_realtime_and_mode_ratios_on_tpu(tpu_backend):
    """Perf gates at the deployed preset (t_block=8192), measured
    back-to-back in one session.

    The CI chip's absolute throughput swings ~20% between sessions
    (shared relay), so the load-bearing gates are same-session RATIOS
    between modes; the absolute floor is a loose sanity bound.
    Healthy values on this chip: int8x2 2.1x (the headline), int12
    3.3x, int13 3.2x; int8x2/int12 ms ratio 1.56 (two passes vs one);
    int13/int12 1.03 (the lane-repeat is free — a relayout regression
    measures 1.5)."""
    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.utils.bench import bench_kernel

    recs = {
        mode: bench_kernel(DSA10.replace(weight_mode=mode), n_blocks=8,
                           repeats=2)
        for mode in ("int8x2", "int12", "int13")
    }
    # Absolute sanity: even a degraded session clears BASELINE parity
    # (>= ~1x full band per device) with margin on the default mode.
    assert recs["int8x2"]["realtime_factor"] >= 1.4, recs
    # int12 must show the one-pass advantage over the two-pass default.
    assert recs["int8x2"]["ms_per_block"] >= 1.3 * recs["int12"]["ms_per_block"], recs
    # int13's double fold must stay one-pass-priced (no lane relayout).
    assert recs["int13"]["ms_per_block"] <= 1.25 * recs["int12"]["ms_per_block"], recs


def test_int13_accuracy_on_tpu(tpu_backend):
    """int13 (double x16 fold, K=8*16=128): noise accuracy clears the
    1e-3 bar on hardware (its one-pass pricing is gated by
    test_realtime_and_mode_ratios_on_tpu)."""
    import jax
    import numpy as np

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024,
                        weight_mode="int13")
    assert cfg.a_compute == 16 and cfg.gemm_k == 128
    wire = make_noise_block(cfg, rms=2.0, seed=3)
    qw = quantize_weights(make_weights(cfg), "int13", cfg.a_compute)
    p = np.asarray(
        beamform_power(jax.device_put(device_wire_view(wire, cfg)), qw, cfg)
    )
    p_ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time
    )
    assert relative_power_error(p, p_ref) <= POWER_RTOL



def test_stokes_accuracy_on_tpu(tpu_backend):
    """Full-Stokes fused kernel on hardware: every plane within 1e-3 of
    the float64 golden (scaled to the Stokes-I peak)."""
    import jax
    import numpy as np

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_stokes, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_stokes_ref

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024)
    wire = make_noise_block(cfg, rms=2.0, seed=9)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    st = np.asarray(
        beamform_stokes(jax.device_put(device_wire_view(wire, cfg)), qw, cfg)
    )
    ref = beamform_stokes_ref(weights_numpy_golden(cfg), wire,
                              cfg.input_layout, cfg.navg_time)
    scale = np.abs(ref[:, :, 0]).max()
    for k, name in enumerate("IQUV"):
        err = np.abs(st[:, :, k] - ref[:, :, k]).max() / scale
        assert err <= 1e-3, (name, err)  # measured 1-3e-5


def test_compact_wire_grouped_path_on_tpu(tpu_backend):
    """Compact 16-slot wire (dsa10c; P*A=32 < 128): the grouped
    lane-slicing corner turn must compile on hardware and pass the
    point-source physics + accuracy gate."""
    import jax

    from dsabeamformer_tpu.config import DSA10_COMPACT
    from dsabeamformer_tpu.ingest.generator import make_point_source_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA10_COMPACT.replace(n_chan=128, t_block=1024, time_tile=1024)
    target = 99
    wire = make_point_source_block(cfg, cfg.beam_angles_rad()[target],
                                   noise_rms=0.4, seed=7)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    p = np.asarray(
        beamform_power(jax.device_put(device_wire_view(wire, cfg)), qw, cfg)
    )
    assert int(np.argmax(p.sum(axis=(0, 1)))) == target
    ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time
    )
    assert relative_power_error(p, ref) <= POWER_RTOL  # measured 4.0e-4


def test_f32_validation_mode_full_precision_on_tpu(tpu_backend):
    """The f32 validation mode must request Precision.HIGHEST: the TPU
    default computes f32 matmuls at bf16 operand precision (measured
    4e-2 vs golden before the fix; 1.1e-5 after)."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_point_source_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import relative_power_error

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024,
                        weight_mode="f32")
    wire = make_point_source_block(cfg, cfg.beam_angles_rad()[100],
                                   noise_rms=0.4, seed=7)
    qw = quantize_weights(make_weights(cfg), "f32", cfg.a_compute)
    p = np.asarray(
        beamform_power(jax.device_put(device_wire_view(wire, cfg)), qw, cfg)
    )
    ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time
    )
    assert relative_power_error(p, ref) <= 1e-4  # bf16 regression = 4e-2


def test_fused_incoherent_on_tpu(tpu_backend):
    """beamform_power(incoherent=True): the two-output fused kernel must
    compile under Mosaic and both products must match their goldens
    (coherent: 1e-3 bar; incoherent: integer-exact vs float64 oracle)."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.incoherent import incoherent_power_golden
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024)
    wire = make_noise_block(cfg, rms=2.0, seed=5)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    p, inco = beamform_power(jax.device_put(device_wire_view(wire, cfg)),
                             qw, cfg, incoherent=True)
    p, inco = np.asarray(p), np.asarray(inco)
    ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time
    )
    assert relative_power_error(p, ref) <= POWER_RTOL
    np.testing.assert_allclose(inco, incoherent_power_golden(wire, cfg),
                               rtol=1e-12)


def test_fused_incoherent_stokes_on_tpu(tpu_backend):
    """beamform_stokes(incoherent=True): the five-plane fused kernel
    (I/Q/U/V + incoherent) must compile under Mosaic; all planes match
    their goldens (Stokes: 1e-3 bar; incoherent: integer-exact)."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_stokes, device_wire_view
    from dsabeamformer_tpu.ops.incoherent import incoherent_power_golden
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_stokes_ref

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024)
    wire = make_noise_block(cfg, rms=2.0, seed=12)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    st, inco = beamform_stokes(jax.device_put(device_wire_view(wire, cfg)),
                               qw, cfg, incoherent=True)
    st, inco = np.asarray(st), np.asarray(inco)
    ref = beamform_stokes_ref(weights_numpy_golden(cfg), wire,
                              cfg.input_layout, cfg.navg_time)
    scale = np.abs(ref[:, :, 0]).max()
    assert np.abs(st - ref).max() / scale <= 1e-3
    np.testing.assert_allclose(inco, incoherent_power_golden(wire, cfg),
                               rtol=1e-12)


def test_sharded_beamformer_mosaic_on_tpu(tpu_backend):
    """shard_map-wrapped pallas_call under Mosaic (VERDICT r2 #1): the
    channel-mesh path has CPU-mesh coverage only; a shard_map around a
    pallas_call is exactly the composition that can fail only at
    Mosaic-compile time.  1-device mesh, DSA-110 subband geometry,
    golden-checked (SURVEY §7 M5 / BASELINE configs[4])."""
    import jax

    from dsabeamformer_tpu.config import DSA110
    from dsabeamformer_tpu.ingest.generator import make_point_source_block
    from dsabeamformer_tpu.models.weights import weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import device_wire_view
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.parallel.sharding import (
        make_mesh,
        shard_weights,
        sharded_beamformer,
        sharded_wire_sharding,
    )
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA110.replace(n_chan=16, t_block=1024)
    mesh = make_mesh(1)
    target = 300
    wire = make_point_source_block(cfg, cfg.beam_angles_rad()[target],
                                   noise_rms=0.4, seed=7)
    step = sharded_beamformer(cfg, mesh, with_band_power=True)
    qw_sh = shard_weights(cfg, mesh)
    wire_sh = jax.device_put(device_wire_view(wire, cfg),
                             sharded_wire_sharding(cfg, mesh))
    powers, band = step(wire_sh, qw_sh)
    powers, band = np.asarray(powers), np.asarray(band)
    assert int(np.argmax(powers.sum(axis=(0, 1)))) == target
    ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time,
        cfg.navg_freq,
    )
    assert relative_power_error(powers, ref) <= POWER_RTOL
    # The psum collective must also compile + agree on hardware.
    np.testing.assert_allclose(band, powers.sum(axis=(0, 2)), rtol=1e-5)


def test_tp_beamformer_mosaic_on_tpu(tpu_backend):
    """Tensor-parallel (antenna-sharded) shard_map path under Mosaic
    (VERDICT r2 #1): beamform_voltages + psum-of-partials + replicated
    detection must compile and be golden-accurate on the real chip.
    1x1 mesh, DSA-110 subband geometry."""
    import jax

    from dsabeamformer_tpu.config import DSA110
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import weights_numpy_golden
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.parallel.tensor import (
        make_tp_mesh,
        shard_weights_tp,
        tp_beamformer,
        tp_wire_sharding,
    )
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA110.replace(n_chan=16, t_block=1024)
    mesh = make_tp_mesh(1, 1)
    wire = make_noise_block(cfg, rms=2.0, seed=11)
    qw = shard_weights_tp(cfg, mesh)
    step = tp_beamformer(cfg, mesh)
    wire_sh = jax.device_put(np.asarray(wire), tp_wire_sharding(cfg, mesh))
    p = np.asarray(step(wire_sh, qw))
    ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time,
        cfg.navg_freq,
    )
    assert relative_power_error(p, ref) <= POWER_RTOL


def test_dsa110_geometry_on_tpu(tpu_backend):
    """DSA-110 geometry on hardware (128 ant -> K=256 two-pass-per-term,
    512 beams): point-source physics + the 1e-3 bar."""
    import jax

    from dsabeamformer_tpu.config import DSA110
    from dsabeamformer_tpu.ingest.generator import make_point_source_block
    from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.utils.testing import POWER_RTOL, relative_power_error

    cfg = DSA110.replace(n_chan=64, t_block=1024)
    target = 300
    wire = make_point_source_block(cfg, cfg.beam_angles_rad()[target],
                                   noise_rms=0.4, seed=7)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    p = np.asarray(
        beamform_power(jax.device_put(device_wire_view(wire, cfg)), qw, cfg)
    )
    assert int(np.argmax(p.sum(axis=(0, 1)))) == target
    ref = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time
    )
    assert relative_power_error(p, ref) <= POWER_RTOL  # measured 2.4e-4


def test_fused_quant8_byte_equal_on_tpu(tpu_backend):
    """In-epilogue uint8 quantization under Mosaic: the fused output
    must be byte-identical to quantizing the f32 kernel output after
    the fact (the 8-bit filterbank sink's fused path; the f32->int32->
    uint8 cast chain is TPU-specific, so the CPU test doesn't cover
    this compile)."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import make_weights
    from dsabeamformer_tpu.ops.gemm import beamform_power
    from dsabeamformer_tpu.ops.quantize import quantize_weights

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024)
    wire = make_noise_block(cfg, rms=2.0, seed=11)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    wire_dev = jax.device_put(wire)
    p32 = np.asarray(beamform_power(wire_dev, qw, cfg))
    rng = np.random.default_rng(9)
    scales = (64.0 / np.median(p32)
              * rng.uniform(0.5, 2.0, cfg.n_beams)).astype(np.float32)
    got = np.asarray(beamform_power(
        wire_dev, qw, cfg, quant8_scales=jax.device_put(scales)))
    want = np.clip(np.rint(p32 * scales[None, None, :]), 0, 255
                   ).astype(np.uint8)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_spectral_kurtosis_on_tpu(tpu_backend):
    """SK scan on hardware: clean noise sits at SK~1, an injected CW
    carrier and a dead channel are the only flags (the estimator's
    XLA reduction path compiles and is numerically sane on TPU)."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import (
        make_noise_block,
        make_tone_block,
    )
    from dsabeamformer_tpu.ops.incoherent import (
        sk_block_stats,
        sk_estimate,
        sk_flags,
        sk_samples_per_block,
    )

    cfg = DSA10.replace(n_chan=128, t_block=1024, time_tile=1024)
    wire = make_noise_block(cfg, rms=2.0, seed=21).reshape(
        cfg.t_block, cfg.n_chan, cfg.n_pol, cfg.n_ant).copy()
    tone = make_tone_block(cfg, chan=33, amplitude=6.0).reshape(
        cfg.t_block, cfg.n_chan, cfg.n_pol, cfg.n_ant)
    wire[:, 33] = tone[:, 33]
    wire[:, 90] = 0
    st = sk_block_stats(jax.device_put(wire.reshape(cfg.wire_block_shape)),
                        cfg)
    m = sk_samples_per_block(cfg)
    sk = sk_estimate(np.asarray(st["s1"]), np.asarray(st["s2"]), m)
    flagged, med, sigma = sk_flags(sk, m)
    assert sorted(flagged) == [33, 90]
    assert abs(med - 1.0) < 0.1


def test_fused_sk_stats_on_tpu(tpu_backend):
    """The in-kernel SK accumulators under Mosaic: the revisited
    accumulator output (zeroed at t==0, accumulated across the
    sequential time-grid axis) is exactly the pattern that can fail
    only at Mosaic-compile time; values must match the standalone
    sk_block_stats pass."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.weights import make_weights
    from dsabeamformer_tpu.ops.gemm import beamform_power
    from dsabeamformer_tpu.ops.incoherent import sk_block_stats
    from dsabeamformer_tpu.ops.quantize import quantize_weights

    # 2 time tiles so the accumulation across grid steps is exercised.
    cfg = DSA10.replace(n_chan=128, t_block=2048, time_tile=1024)
    wire = make_noise_block(cfg, rms=2.0, seed=31)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    wire_dev = jax.device_put(wire)
    p0 = np.asarray(beamform_power(wire_dev, qw, cfg))
    p, sk = beamform_power(wire_dev, qw, cfg, sk_stats=True)
    np.testing.assert_allclose(np.asarray(p), p0, rtol=1e-6)
    ref = {k: np.asarray(v) for k, v in sk_block_stats(wire_dev, cfg).items()}
    sk = np.asarray(sk)
    np.testing.assert_allclose(sk[:, 0], ref["s1"], rtol=1e-5)
    np.testing.assert_allclose(sk[:, 1], ref["s2"], rtol=1e-5)
    # And composed with the incoherent side-product (the VMEM-heaviest
    # kernel configuration).
    p2, inco, sk2 = beamform_power(wire_dev, qw, cfg, incoherent=True,
                                   sk_stats=True)
    np.testing.assert_allclose(np.asarray(sk2), sk, rtol=1e-6)


def test_search_stage_on_tpu(tpu_backend):
    """The search-stage device programs on real hardware: the
    channel-scan gather bank, the median/MAD + cumsum + top_k matched
    filter, and their beam-BATCHED (vmapped) variants — none of which
    the CPU suite proves compile on TPU.  Checks physics (injected
    pulse recovered at its DM/time) and batched == per-beam equality
    on device."""
    from dsabeamformer_tpu.config import DM_CONST_S, dm_delays_s
    from dsabeamformer_tpu.ops.dedisperse import (
        dm_trial_grid,
        search_spectrogram,
        search_spectrograms,
    )

    rng = np.random.default_rng(17)
    f_lo, f_hi, tsamp = 1280.0, 1530.0, 1.048576e-3
    t, nf, dm_true, t0 = 4096, 256, 90.0, 1200
    freqs = np.linspace(f_lo, f_hi, nf)
    shifts = np.rint(
        dm_delays_s(freqs, dm_true, freqs[-1]) / tsamp).astype(int)
    spectra = []
    for b in range(4):
        x = rng.normal(size=(t, nf)).astype(np.float32)
        if b in (1, 2):
            for f in range(nf):
                x[t0 + shifts[f]: t0 + shifts[f] + 4, f] += 0.8
        spectra.append((b, x))
    dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=300.0, tol=1.25)
    step = dms[1] - dms[0]
    # single-beam program: physics
    cands = search_spectrogram(spectra[1][1], freqs, tsamp, dms,
                               threshold=7.0)
    assert cands and abs(cands[0].dm - dm_true) <= 2 * step
    assert abs(cands[0].t_samp - t0) <= 8
    # batched program: candidate-for-candidate equal to per-beam
    by_beam = search_spectrograms(spectra, freqs, tsamp, dms,
                                  threshold=7.0, beam_batch=4)
    for b, x in spectra:
        ref = search_spectrogram(x, freqs, tsamp, dms, threshold=7.0)
        got = by_beam[b]
        assert len(got) == len(ref), b
        for cg, cr in zip(got, ref):
            assert (cg.snr, cg.t_samp, cg.dm_idx, cg.width) == (
                cr.snr, cr.t_samp, cr.dm_idx, cr.width), b
    # subband method compiles + agrees on the pulse too
    sub = search_spectrogram(spectra[1][1], freqs, tsamp, dms,
                             threshold=7.0, method="subband")
    assert sub and abs(sub[0].dm - dm_true) <= 2 * step


def test_conv_bank_on_tpu(tpu_backend):
    """The production (method="conv") dedispersion bank on real
    hardware: the one-hot grouped conv + dynamic-slice program must
    (a) agree with the gather subband bank bit-near (same plan, same
    sums), (b) recover the injected pulse, and (c) run a window in
    seconds, not the gather bank's half-minute — the whole point of
    the TPU-native rework (BENCH.md "Deployed configuration
    (round 5)").  The time bound is 20x slack off the ~0.1 s
    measurement so relay jitter can't flake it, while the 33 s
    gather-class regression still fails loudly."""
    import time

    from dsabeamformer_tpu.config import dm_delays_s
    from dsabeamformer_tpu.ops.dedisperse import (
        conv_dedisperse_bank,
        delay_table,
        dm_trial_grid,
        search_spectrogram,
        subband_dedisperse_bank,
    )

    rng = np.random.default_rng(23)
    f_lo, f_hi, tsamp = 1280.0, 1530.0, 1.048576e-3
    t, nf, dm_true, t0 = 4096, 256, 90.0, 1200
    freqs = np.linspace(f_lo, f_hi, nf)
    shifts = np.rint(
        dm_delays_s(freqs, dm_true, freqs[-1]) / tsamp).astype(int)
    x = rng.normal(size=(t, nf)).astype(np.float32)
    for f in range(nf):
        x[t0 + shifts[f]: t0 + shifts[f] + 4, f] += 0.8
    dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=300.0, tol=1.25)
    delays = delay_table(freqs, dms, tsamp)
    b_conv, v_conv = conv_dedisperse_bank(x, delays)
    b_sub, v_sub = subband_dedisperse_bank(x, delays, n_sub=16)
    assert np.array_equal(v_conv, v_sub)
    # Compare the GUARANTEED data-covered region only: the two-stage
    # plan's approximated delay can exceed the true per-trial max by
    # up to max_err_samples (=1), so the last sample inside valid_len
    # may legally read the median-fill row — which the conv bank
    # estimates from a <=512-row subsample at this window size while
    # the gather bank uses the full median (first caught by this gate
    # at sha 7c0cd88: trial 17's final valid sample, 4.120 vs 4.097).
    bc, bs = np.asarray(b_conv), np.asarray(b_sub)
    for d in range(len(dms)):
        n = max(0, int(v_conv[d]) - 1)
        assert np.allclose(bc[d, :n], bs[d, :n],
                           rtol=1e-4, atol=1e-3), d
    step = dms[1] - dms[0]
    cands = search_spectrogram(x, freqs, tsamp, dms, threshold=7.0,
                               method="conv")
    assert cands and abs(cands[0].dm - dm_true) <= 2 * step
    assert abs(cands[0].t_samp - t0) <= 8
    # warm timing: one full window (bank + fetch fence via np.asarray)
    best = float("inf")
    for _ in range(2):
        t_start = time.perf_counter()
        b, _ = conv_dedisperse_bank(x, delays)
        float(np.asarray(b.ravel()[0]))
        best = min(best, time.perf_counter() - t_start)
    assert best < 5.0, f"conv bank {best:.1f}s — gather-class regression?"


def test_conv_bank_uint8_bf16_on_tpu(tpu_backend):
    """The uint8 fused-product fast path (single-pass bf16 MXU conv,
    `_conv_bank_jit`) must be BIT-identical to the f32 HIGHEST path
    on the real MXU in the guaranteed-data region — the claim is
    exactness, not tolerance, so it needs the hardware's actual bf16
    multiplier (measured 2026-08-20: 46.4 vs 74.8 ms/window device
    program at the DM-100 monitor geometry, 0/465 trials differ)."""
    from dsabeamformer_tpu.ops.dedisperse import (
        conv_dedisperse_bank,
        delay_table,
        dm_trial_grid,
    )

    rng = np.random.default_rng(5)
    nf, t = 256, 2048
    freqs = np.linspace(1280.0, 1530.0, nf)
    tsamp = 1.048576e-3
    x8 = rng.integers(0, 256, size=(t, nf), dtype=np.uint8)
    dms = dm_trial_grid(1280.0, 1530.0, tsamp, dm_max=300.0, tol=1.25)
    delays = delay_table(freqs, dms, tsamp)
    b8, v = conv_dedisperse_bank(x8, delays)
    bf, vf = conv_dedisperse_bank(x8.astype(np.float32), delays)
    assert np.array_equal(v, vf)
    a8, af = np.asarray(b8), np.asarray(bf)
    for d in range(len(dms)):
        n = max(0, int(v[d]) - 1)
        assert np.array_equal(a8[d, :n], af[d, :n]), d


def test_mesh_streaming_driver_on_tpu(tpu_backend):
    """STREAMING through the mesh on real hardware (VERDICT r3 #1): the
    MeshStreamingBeamformer drives the shard_map step block after block
    on a 1-device mesh — sharded device_put, drained sharded products,
    a mid-stream re-sharded weight update, and the band-power psum all
    under Mosaic."""
    from dsabeamformer_tpu.config import DSA110
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.models.calibration import CalTable
    from dsabeamformer_tpu.models.weights import (
        make_weights,
        weights_numpy_golden,
    )
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.ops.reference import beamform_block_ref
    from dsabeamformer_tpu.parallel.sharding import make_mesh
    from dsabeamformer_tpu.pipeline import (
        CollectSink,
        MeshStreamingBeamformer,
        SyntheticSource,
    )
    from dsabeamformer_tpu.utils.testing import assert_power_close

    cfg = DSA110.replace(n_chan=16, t_block=1024)
    mesh = make_mesh(1)
    wire = np.asarray(make_noise_block(cfg, rms=2.0, seed=13))
    qw0 = quantize_weights(make_weights(cfg), cfg.weight_mode,
                           cfg.a_compute)
    cal = CalTable.random(cfg, seed=5)
    qw1 = quantize_weights(make_weights(cfg, cal=cal), cfg.weight_mode,
                           cfg.a_compute)
    src = SyntheticSource(cfg, [wire], n_blocks=6)
    sink = CollectSink()
    bands = {}
    bf = MeshStreamingBeamformer(
        cfg, qw0, src, sink, mesh=mesh, depth=2,
        with_band_power=True,
        on_band_power=lambda seq, band: bands.__setitem__(seq, band),
    )

    def on_block(bs):
        if bs.block_idx == 2:
            bf.update_weights(qw1)

    bf.on_block = on_block
    bf.warmup()
    stats = bf.run()
    assert stats.n_blocks == 6 and len(sink.outputs) == 6
    ref0 = beamform_block_ref(
        weights_numpy_golden(cfg), wire, cfg.input_layout, cfg.navg_time,
        cfg.navg_freq,
    )
    ref1 = beamform_block_ref(
        weights_numpy_golden(cfg, cal=cal), wire, cfg.input_layout,
        cfg.navg_time, cfg.navg_freq,
    )
    first_new = None
    for seq, p in sink.outputs:
        regime = 0 if np.abs(p - ref0).max() < np.abs(p - ref1).max() else 1
        if regime == 1 and first_new is None:
            first_new = seq
        assert_power_close(p, ref1 if regime else ref0,
                           what=f"mesh stream block {seq} on hw")
        np.testing.assert_allclose(bands[seq], p.sum(axis=(0, 2)),
                                   rtol=1e-5)
    assert first_new is not None and 3 <= first_new <= 5


def test_fused_stokes_quant8_byte_equal_on_tpu(tpu_backend):
    """The in-epilogue 8-bit Stokes quantizer (round-5 lever that takes
    the 4x f32 Stokes output block off HBM) is byte-identical to the
    two-pass device quantizer on real Mosaic, midpoint offsets
    included."""
    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_noise_block
    from dsabeamformer_tpu.ingest.sigproc import _get_quant8_stokes
    from dsabeamformer_tpu.models.weights import make_weights
    from dsabeamformer_tpu.ops.gemm import beamform_stokes, device_wire_view
    from dsabeamformer_tpu.ops.quantize import prepare_weights

    cfg = DSA10.replace(n_chan=128, t_block=2048, time_tile=1024,
                        chan_tile=4)
    wire = device_wire_view(make_noise_block(cfg, rms=2.0, seed=55), cfg)
    qw = prepare_weights(cfg, make_weights(cfg))
    dev = jax.device_put(wire)
    f32 = beamform_stokes(dev, qw, cfg)
    med = np.median(np.asarray(f32)[:, :, 0, :], axis=(0, 1))
    scales = jax.device_put((64.0 / med).astype(np.float32))
    want = np.asarray(_get_quant8_stokes()(f32, scales))
    got = np.asarray(beamform_stokes(dev, qw, cfg, quant8_scales=scales))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_perf_regression_on_tpu(tpu_backend):
    """The 2.1x headline is a floor, not a screenshot (VERDICT r4 #5):
    a short dispatch loop at the unmodified DSA-10 preset must stay
    within PERF_BASELINE.json's max_regression of the checked-in
    ms/block.  A kernel edit that silently costs >15% turns this gate
    red."""
    import json
    import time
    from pathlib import Path

    import jax

    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.ingest.generator import make_random_bytes_block
    from dsabeamformer_tpu.models.weights import make_weights
    from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
    from dsabeamformer_tpu.ops.quantize import quantize_weights
    from dsabeamformer_tpu.utils.bench import _digest

    base = json.loads(
        (Path(__file__).resolve().parent.parent / "PERF_BASELINE.json")
        .read_text())
    cfg = DSA10  # the deployed default — must match the baseline config
    assert base["config"] == cfg.name and base["t_block"] == cfg.t_block
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    blocks = [jax.device_put(
        device_wire_view(make_random_bytes_block(cfg, seed=s), cfg))
        for s in range(2)]
    float(_digest(beamform_power(blocks[0], qw, cfg)))  # compile+warm
    n = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = beamform_power(blocks[i % 2], qw, cfg)
        float(_digest(out))
        best = min(best, (time.perf_counter() - t0) / n)
    ms = best * 1e3
    limit = base["ms_per_block"] * base["max_regression"]
    assert ms <= limit, (
        f"perf regression: {ms:.2f} ms/block vs baseline "
        f"{base['ms_per_block']} ms (limit {limit:.2f}; "
        f"{base['source']}) — if intentional, update PERF_BASELINE.json "
        f"alongside a BENCH.md entry")
