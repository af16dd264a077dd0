"""Canonical device-wire forms (cfg.device_wire_shape) must agree with
the legacy 4-D host form and the float64 golden model.

The canonical form is the layout-copy-free contract the streaming driver
uses: a free host-side view of the capture buffer whose minor dim is a
lane multiple, so XLA's default parameter layout already matches the
fused kernel's operand (measured ~2 ms/block relayout otherwise).  For
'tfpa' it additionally exercises the time-major kernel path (grid-level
corner-turn + in-kernel lane slice).
"""

import numpy as np
import pytest

from dsabeamformer_tpu.ingest.generator import make_noise_block
from dsabeamformer_tpu.models.weights import make_weights, weights_numpy_golden
from dsabeamformer_tpu.ops.gemm import beamform_power, device_wire_view
from dsabeamformer_tpu.ops.quantize import quantize_weights
from dsabeamformer_tpu.ops.reference import beamform_block_ref
from dsabeamformer_tpu.utils.testing import assert_power_close


@pytest.mark.parametrize("layout", ["ftpa", "tfpa"])
def test_device_form_equals_host_form(tiny_cfg, layout):
    cfg = tiny_cfg.replace(input_layout=layout)
    wire4 = make_noise_block(cfg, rms=2.0, seed=33)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    p4 = np.asarray(beamform_power(wire4, qw, cfg))
    wire_dev = device_wire_view(wire4, cfg)
    assert wire_dev.shape == cfg.device_wire_shape
    # A view, not a copy: same underlying bytes.
    assert np.asarray(wire_dev).base is not None
    p_dev = np.asarray(beamform_power(wire_dev, qw, cfg))
    np.testing.assert_array_equal(p4, p_dev)


@pytest.mark.parametrize("layout", ["ftpa", "tfpa"])
def test_device_form_vs_golden(tiny_cfg, layout):
    cfg = tiny_cfg.replace(input_layout=layout)
    wire4 = make_noise_block(cfg, rms=2.0, seed=34)
    qw = quantize_weights(make_weights(cfg), cfg.weight_mode, cfg.a_compute)
    p = np.asarray(beamform_power(device_wire_view(wire4, cfg), qw, cfg))
    w = weights_numpy_golden(cfg)
    p_ref = beamform_block_ref(w, wire4, cfg.input_layout, cfg.navg_time,
                               cfg.navg_freq)
    assert_power_close(p, p_ref, rtol=2e-4, what=f"device-wire {layout}")


def test_time_major_lane_slice_path(tiny_cfg):
    """The in-kernel lane-slice corner turn (time-major path, taken on
    hardware when P*A is a lane multiple) must match the channel-major
    kernel exactly.  Interpret mode has no lane-alignment constraint, so
    TINY (P*A=32) exercises the same code path the TPU presets compile."""
    cfg_t = tiny_cfg.replace(input_layout="tfpa")
    cfg_f = tiny_cfg.replace(input_layout="ftpa")
    wire_t4 = make_noise_block(cfg_t, rms=2.0, seed=35)  # [T,F,P,A]
    wire_f4 = np.ascontiguousarray(wire_t4.transpose(1, 0, 2, 3))
    qw = quantize_weights(make_weights(cfg_f), cfg_f.weight_mode,
                          cfg_f.a_compute)
    p_t = np.asarray(beamform_power(device_wire_view(wire_t4, cfg_t), qw,
                                    cfg_t))
    p_f = np.asarray(beamform_power(device_wire_view(wire_f4, cfg_f), qw,
                                    cfg_f))
    np.testing.assert_allclose(p_t, p_f, rtol=1e-6)


def test_bad_wire_shape_rejected(tiny_cfg):
    qw = quantize_weights(make_weights(tiny_cfg), tiny_cfg.weight_mode,
                          tiny_cfg.a_compute)
    bad = np.zeros((3, 5), np.uint8)
    with pytest.raises(ValueError, match="neither the canonical"):
        beamform_power(bad, qw, tiny_cfg)


def test_compact_wire_grouped_lane_slicing(tiny_cfg):
    """Compact wire (P*A < 128): the time-major kernel slices channels
    in aligned groups (one 128-lane dynamic slice + static sub-slices).
    chan_tile=4 makes P*A*fc = 128 — the grouped path — and must match
    the channel-major result exactly."""
    cfg_t = tiny_cfg.replace(input_layout="tfpa", chan_tile=4)  # PA=32, g=4
    cfg_f = tiny_cfg.replace(input_layout="ftpa", chan_tile=4)
    wire_t4 = make_noise_block(cfg_t, rms=2.0, seed=91)
    wire_f4 = np.ascontiguousarray(wire_t4.transpose(1, 0, 2, 3))
    qw = quantize_weights(make_weights(cfg_f), cfg_f.weight_mode,
                          cfg_f.a_compute)
    p_t = np.asarray(
        beamform_power(device_wire_view(wire_t4, cfg_t), qw, cfg_t)
    )
    p_f = np.asarray(
        beamform_power(device_wire_view(wire_f4, cfg_f), qw, cfg_f)
    )
    np.testing.assert_allclose(p_t, p_f, rtol=1e-6)
