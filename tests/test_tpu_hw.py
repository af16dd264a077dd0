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

    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend in this process")
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


def test_realtime_factor_on_tpu(tpu_backend):
    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.utils.bench import bench_kernel

    cfg = DSA10.replace(t_block=2048)  # deployed tfpa path, short blocks
    rec = bench_kernel(cfg, n_blocks=8, repeats=2)
    # Round-2 regression floor: measured 1.8x on the derated CI chip at
    # t_block=2048 (2.1x at the preset's t_block=8192; BASELINE parity
    # is >= ~1x full band per device).
    assert rec["realtime_factor"] >= 1.5, rec


def test_int12_faster_than_int8x2_on_tpu(tpu_backend):
    from dsabeamformer_tpu.config import DSA10
    from dsabeamformer_tpu.utils.bench import bench_kernel

    base = DSA10.replace(t_block=2048)
    r12 = bench_kernel(base.replace(weight_mode="int12"), n_blocks=8,
                       repeats=2)
    # Measured 2.0-2.2x at t_block=2048 on the derated CI chip (3.3x at
    # the preset's t_block=8192); floor set under the observed ~8%
    # run-to-run variance of this short measurement.
    assert r12["realtime_factor"] >= 1.85, r12
