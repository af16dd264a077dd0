"""Full-Stokes fused kernel (ops.gemm.beamform_stokes) vs the float64
golden model.  No reference counterpart (the CUDA pipeline is Stokes I
only, SURVEY.md L5)."""

import numpy as np
import pytest

from dsabeamformer_tpu.ingest.generator import (
    make_noise_block,
    make_point_source_block,
)
from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
from dsabeamformer_tpu.ops.gemm import (
    beamform_power,
    beamform_stokes,
    device_wire_view,
)
from dsabeamformer_tpu.ops.packing import pack_4r4i, unpack_4r4i
from dsabeamformer_tpu.ops.quantize import quantize_weights
from dsabeamformer_tpu.ops.reference import beamform_stokes_ref
from dsabeamformer_tpu.utils.testing import assert_power_close


@pytest.mark.parametrize("layout", ["tfpa", "ftpa"])
@pytest.mark.parametrize("mode,rtol", [("int8x2", 3e-4), ("f32", 1e-5)])
def test_stokes_vs_golden(tiny_cfg, layout, mode, rtol):
    cfg = tiny_cfg.replace(input_layout=layout, weight_mode=mode)
    wire = make_noise_block(cfg, rms=2.5, seed=77)
    qw = quantize_weights(make_weights(cfg), mode, cfg.a_compute)
    st = np.asarray(beamform_stokes(device_wire_view(wire, cfg), qw, cfg))
    ref = beamform_stokes_ref(weights_numpy_golden(cfg), wire,
                              cfg.input_layout, cfg.navg_time, cfg.navg_freq)
    assert st.shape == (cfg.n_chan, cfg.t_block // cfg.navg_time, 4,
                        cfg.n_beams)
    # Q/U/V swing negative and through zero; gate each plane against the
    # Stokes-I peak (the natural scale), like the power metric's floor.
    scale = np.abs(ref[:, :, 0]).max()
    for k, name in enumerate("IQUV"):
        err = np.abs(st[:, :, k] - ref[:, :, k]).max() / scale
        assert err <= rtol, (name, err)


def test_stokes_i_equals_power(tiny_cfg):
    cfg = tiny_cfg
    wire = make_noise_block(cfg, rms=2.0, seed=5)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    st = np.asarray(beamform_stokes(wire, qw, cfg))
    p = np.asarray(beamform_power(wire, qw, cfg))
    np.testing.assert_allclose(st[:, :, 0], p, rtol=1e-6)


def test_pure_x_polarization(tiny_cfg):
    """A noiseless X-only source: Q == I, U == V == 0."""
    cfg = tiny_cfg
    wire = np.asarray(
        make_point_source_block(cfg, cfg.beam_angles_rad()[10],
                                noise_rms=0.0, seed=2)
    ).copy()
    # Zero the Y-pol bytes (pol axis is dim 2 of the 4-D host form).
    re, im = unpack_4r4i(wire)
    re[:, :, 1] = 0
    im[:, :, 1] = 0
    wire = pack_4r4i(re, im)
    qw = quantize_weights(make_weights(cfg), "f32", cfg.a_compute)
    st = np.asarray(beamform_stokes(wire, qw, cfg))
    i_pk = np.abs(st[:, :, 0]).max()
    np.testing.assert_allclose(st[:, :, 1], st[:, :, 0], atol=1e-5 * i_pk)
    assert np.abs(st[:, :, 2]).max() <= 1e-5 * i_pk
    assert np.abs(st[:, :, 3]).max() <= 1e-5 * i_pk
