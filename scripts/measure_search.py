"""Measure the single-pulse search stage (`ops/dedisperse.py`) on the
real chip at DSA-10 product scale.

The searched object is the POST-DETECTION dynamic spectrum — tiny next
to the wire blocks (F=2048 float32 channels at the 131 us averaged
cadence is 16 MB/s), but the DM-trial bank multiplies it: the work is
``n_dm * T * F`` gather-adds with a ``[n_dm, T]`` accumulator carried
across the channel scan, so this stage is HBM/VPU-bound, not MXU-bound.
What this script answers: how many DM trials can one chip search in
realtime ALONGSIDE beamforming, i.e. the chip-budget line BENCH.md's
deployment guidance needs.

Run on the TPU (relay up):
  PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python scripts/measure_search.py
"""
import json
import time

import numpy as np
import jax

from dsabeamformer_tpu.utils.hostenv import enable_jax_cache, require_tpu_backend
enable_jax_cache()
from dsabeamformer_tpu.config import DSA10
from dsabeamformer_tpu.ops.dedisperse import (
    DEFAULT_WIDTHS,
    _dedisperse_c,
    _snr_topk_c,
    delay_table,
    dm_trial_grid,
)

assert require_tpu_backend()
cfg = DSA10
tsamp = cfg.sample_period_s * cfg.navg_time
f_mhz = cfg.freqs_hz() / 1e6
f_lo, f_hi = float(f_mhz.min()), float(f_mhz.max())
T = 16384  # output samples per search chunk (~2.1 s of sky)

rng = np.random.default_rng(0)
rows = []
for dm_max in (250.0, 500.0, 1000.0):
    dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=dm_max, tol=1.25)
    delays = delay_table(f_mhz, dms, tsamp)
    max_d = int(delays.max())
    x = rng.normal(size=(T + max_d, cfg.n_chan)).astype(np.float32)
    k = 4
    span_s = T * tsamp

    # --- direct (brute-force) bank: device-resident operands ---
    dev_x = jax.device_put(x.T)        # padded [F, T+max_d]
    dev_d = jax.device_put(delays)
    bank = _dedisperse_c(dev_x, dev_d, T)   # compile + warm
    snr, idx = _snr_topk_c(bank, DEFAULT_WIDTHS, k)
    float(np.asarray(snr).max())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        bank = _dedisperse_c(dev_x, dev_d, T)
        snr, idx = _snr_topk_c(bank, DEFAULT_WIDTHS, k)
        float(np.asarray(snr).max())   # scalar fetch = execution fence
        best = min(best, time.perf_counter() - t0)

    # --- subband bank: timed end-to-end incl. host plan/packing ---
    from dsabeamformer_tpu.ops.dedisperse import (
        _snr_topk_c as _snr, subband_dedisperse_bank)
    xt = x[: T]  # unpadded [T, F]; the bank pads itself
    b, _ = subband_dedisperse_bank(xt, delays, n_sub=64)  # warm
    float(np.asarray(_snr(b, DEFAULT_WIDTHS, k)[0]).max())
    best_sub = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b, _ = subband_dedisperse_bank(xt, delays, n_sub=64)
        s, _i = _snr(b, DEFAULT_WIDTHS, k)
        float(np.asarray(s).max())
        best_sub = min(best_sub, time.perf_counter() - t0)

    rows.append({
        "dm_max": dm_max, "n_dm": len(dms), "max_delay_samp": max_d,
        "chunk_s": round(span_s, 3),
        "direct_s": round(best, 3),
        "direct_rt": round(span_s / best, 2),
        "subband_s": round(best_sub, 3),
        "subband_rt": round(span_s / best_sub, 2),
        "gather_adds_G": round(len(dms) * T * cfg.n_chan / 1e9, 1),
    })
    print(json.dumps(rows[-1]))

# --- beam-batched vs per-beam dispatch (dsabf search --beam all) ---
# Device-resident operands (as above): isolates the dispatch/batching
# effect from the CI relay's H2D.  The batched path runs the vmapped
# bank+topk once per beam GROUP; the loop path dispatches per beam.
from dsabeamformer_tpu.ops.dedisperse import (
    _dedisperse_batch_c, _snr_topk_batch_c)

B = 8
dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=250.0, tol=1.25)
delays = delay_table(f_mhz, dms, tsamp)
max_d = int(delays.max())
xs = rng.normal(size=(B, cfg.n_chan, T + max_d)).astype(np.float32)
dev_xs = jax.device_put(xs)
dev_xl = [jax.device_put(xs[i]) for i in range(B)]
dev_d = jax.device_put(delays)
span_s = B * T * tsamp

s, _ = _snr_topk_batch_c(_dedisperse_batch_c(dev_xs, dev_d, T),
                         DEFAULT_WIDTHS, 4)            # warm batch
float(np.asarray(s).max())
for xi in dev_xl[:1]:                                  # warm loop
    s, _ = _snr_topk_c(_dedisperse_c(xi, dev_d, T), DEFAULT_WIDTHS, 4)
    float(np.asarray(s).max())

best_batch = best_loop = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    s, _ = _snr_topk_batch_c(_dedisperse_batch_c(dev_xs, dev_d, T),
                             DEFAULT_WIDTHS, 4)
    float(np.asarray(s).max())
    best_batch = min(best_batch, time.perf_counter() - t0)
    t0 = time.perf_counter()
    for xi in dev_xl:
        s, _ = _snr_topk_c(_dedisperse_c(xi, dev_d, T), DEFAULT_WIDTHS, 4)
        float(np.asarray(s).max())
    best_loop = min(best_loop, time.perf_counter() - t0)

row = {
    "beams": B, "dm_max": 250.0, "n_dm": len(dms),
    "batched_s": round(best_batch, 3),
    "batched_rt": round(span_s / best_batch, 2),
    "loop_s": round(best_loop, 3),
    "loop_rt": round(span_s / best_loop, 2),
    "batch_speedup": round(best_loop / best_batch, 2),
}
rows.append(row)
print(json.dumps(row))

print(json.dumps({"rows": rows}))
