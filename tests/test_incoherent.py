"""Incoherent-sum detection (ops/incoherent.py) vs its float64 oracle,
both wire layouts and both wire forms."""

import numpy as np
import pytest

from dsabeamformer_tpu.ingest.generator import make_noise_block
from dsabeamformer_tpu.ops.gemm import device_wire_view
from dsabeamformer_tpu.ops.incoherent import (
    incoherent_power,
    incoherent_power_golden,
)


@pytest.mark.parametrize("layout", ["tfpa", "ftpa"])
def test_incoherent_matches_golden(tiny_cfg, layout):
    cfg = tiny_cfg.replace(input_layout=layout)
    wire = make_noise_block(cfg, rms=2.5, seed=42)
    p = np.asarray(incoherent_power(wire, cfg))
    ref = incoherent_power_golden(wire, cfg)
    assert p.shape == (cfg.n_chan, cfg.t_block // cfg.navg_time)
    # The device path is integer arithmetic end-to-end; the float64
    # oracle carries ~1e-13 summation rounding, hence allclose not
    # array_equal (verified identical to the last integer on TPU).
    np.testing.assert_allclose(p, ref, rtol=1e-12)
    # Canonical device form agrees exactly too.
    p_dev = np.asarray(incoherent_power(device_wire_view(wire, cfg), cfg))
    np.testing.assert_array_equal(p_dev, p)


def test_incoherent_scales_with_signal(tiny_cfg):
    quiet = make_noise_block(tiny_cfg, rms=0.5, seed=1)
    loud = make_noise_block(tiny_cfg, rms=3.0, seed=1)
    pq = float(np.asarray(incoherent_power(quiet, tiny_cfg)).mean())
    pl = float(np.asarray(incoherent_power(loud, tiny_cfg)).mean())
    assert pl > 4 * pq
