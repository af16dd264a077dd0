"""Measure the single-pulse search stage (`ops/dedisperse.py`) on the
real chip at DSA-10 product scale.

The searched object is the POST-DETECTION dynamic spectrum — tiny next
to the wire blocks (F=2048 float32 channels at the 131 us averaged
cadence is 16 MB/s) — but the DM-trial bank multiplies it, and the
bank's PRIMITIVE decides everything on TPU: the scan-gather bank
measures ~7 ns per gathered element (33.4 s per monitor window,
BENCH.md "Deployed configuration (round 5)"), so this script measures
the production `conv` bank (MXU one-hot conv stage 1 + dynamic-slice
stage 2) across DM ranges, with one small-geometry direct-bank row to
document the gather pathology it replaced.  What it answers: how many
DM trials one chip searches in realtime ALONGSIDE beamforming — the
chip-budget line BENCH.md's deployment guidance needs.

Run on the TPU (relay up):
  PYTHONPATH=/root/.axon_site:/root/repo /opt/venv/bin/python scripts/measure_search.py
"""
import json
import sys
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
    _snr_topk_batch_c,
    conv_dedisperse_bank,
    conv_dedisperse_bank_batch,
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


def fence(a):
    # scalar fetch: block_until_ready does not reliably fence on the
    # axon relay (BENCH.md Methodology)
    return float(np.asarray(a.ravel()[0]))


# n_sub per row = what production picks (`_conv_auto_n_sub`): wider DM
# ranges get more subband groups, bounding the one-hot kernel and the
# single-dispatch length (a multi-minute dispatch crashes this CI's
# TPU worker — the round-5 first attempt).
from dsabeamformer_tpu.ops.dedisperse import _conv_auto_n_sub

for dm_max in (250.0, 500.0, 1000.0):
    dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=dm_max, tol=1.25)
    delays = delay_table(f_mhz, dms, tsamp)
    n_sub = _conv_auto_n_sub(delays)
    max_d = int(delays.max())
    x = rng.normal(size=(T + max_d, cfg.n_chan)).astype(np.float32)
    k = 4
    span_s = T * tsamp

    # conv bank end-to-end: host plan/pad/pack + H2D + bank + topk +
    # scalar fence — what one offline chunk (or monitor window at this
    # chunk_t) costs.
    t0 = time.perf_counter()
    bank, _ = conv_dedisperse_bank(x, delays, n_sub=n_sub)  # warm/compile
    snr, idx = _snr_topk_c(bank, DEFAULT_WIDTHS, k)
    fence(snr)
    print(f"[search] dm_max={dm_max:.0f}: conv compile+warm "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        bank, _ = conv_dedisperse_bank(x, delays, n_sub=n_sub)
        snr, idx = _snr_topk_c(bank, DEFAULT_WIDTHS, k)
        fence(snr)
        best = min(best, time.perf_counter() - t0)

    rows.append({
        "dm_max": dm_max, "n_dm": len(dms), "n_sub": n_sub,
        "max_delay_samp": max_d,
        "chunk_s": round(span_s, 3),
        "conv_s": round(best, 3),
        "conv_rt": round(span_s / best, 2),
        "gather_adds_G": round(len(dms) * T * cfg.n_chan / 1e9, 1),
    })
    print(json.dumps(rows[-1]), flush=True)

# stage decomposition at the LIVE MONITOR geometry (T=4096, dm_max=100
# — the window the deployed-config search monitor dispatches): where
# the 990 ms/window of BENCH.md "Deployed configuration (round 5)"
# actually goes.  host = _conv_bank_prep (plan cached, subsampled
# median fill); device = bank+topk with every operand already
# device-resident; h2d+dispatch = end_to_end - host - device (the CI
# relay's window upload, absent on a real TPU host).
from dsabeamformer_tpu.ops.dedisperse import _conv_bank_c, _conv_bank_prep

T_mon = 4096
dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=100.0, tol=1.25)
delays = delay_table(f_mhz, dms, tsamp)
max_d = int(delays.max())
x_mon = rng.normal(size=(1, T_mon + max_d, cfg.n_chan)).astype(np.float32)

# warm everything once end-to-end
bank, _ = conv_dedisperse_bank(x_mon[0], delays)
fence(_snr_topk_c(bank, DEFAULT_WIDTHS, 4)[0])

best_e2e = best_host = best_dev = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    bank, _ = conv_dedisperse_bank(x_mon[0], delays)
    snr, idx = _snr_topk_c(bank, DEFAULT_WIDTHS, 4)
    fence(snr)
    best_e2e = min(best_e2e, time.perf_counter() - t0)

    t0 = time.perf_counter()
    xp, fill, kern, offsets, t_pad, g, t1, _vl = _conv_bank_prep(
        x_mon, delays, 16, 1)
    best_host = min(best_host, time.perf_counter() - t0)

    dev = [jax.device_put(a) for a in
           (xp, fill, np.asarray(kern), offsets)]
    fence(dev[0])
    t0 = time.perf_counter()
    bank = _conv_bank_c(dev[0], dev[1], dev[2], dev[3],
                        t_pad, g, t1, x_mon.shape[1])[0]
    snr, idx = _snr_topk_c(bank, DEFAULT_WIDTHS, 4)
    fence(snr)
    best_dev = min(best_dev, time.perf_counter() - t0)

row = {
    "monitor_T": T_mon, "dm_max": 100.0, "n_dm": len(dms),
    "window_e2e_ms": round(best_e2e * 1e3, 1),
    "host_prep_ms": round(best_host * 1e3, 1),
    "device_ms": round(best_dev * 1e3, 1),
    "h2d_dispatch_ms": round((best_e2e - best_host - best_dev) * 1e3, 1),
}
rows.append(row)
print(json.dumps(row), flush=True)

# one direct-bank row at REDUCED geometry: the gather pathology, with
# a dispatch small enough not to trip the runtime watchdog (the
# full-size direct bank is a multi-minute single dispatch — the round-5
# first-attempt crash).
T_small, dm_small = 2048, 100.0
dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=dm_small, tol=1.25)
delays = delay_table(f_mhz, dms, tsamp)
max_d = int(delays.max())
x = rng.normal(size=(T_small + max_d, cfg.n_chan)).astype(np.float32)
dev_x = jax.device_put(x.T)
dev_d = jax.device_put(delays)
bank = _dedisperse_c(dev_x, dev_d, T_small)
fence(bank)
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    bank = _dedisperse_c(dev_x, dev_d, T_small)
    fence(bank)
    best = min(best, time.perf_counter() - t0)
elems = len(dms) * T_small * cfg.n_chan
row = {
    "direct_T": T_small, "direct_dm_max": dm_small, "n_dm": len(dms),
    "direct_s": round(best, 3),
    "direct_ns_per_element": round(best / elems * 1e9, 2),
    "chunk_s": round(T_small * tsamp, 3),
    "direct_rt": round(T_small * tsamp / best, 3),
}
rows.append(row)
print(json.dumps(row), flush=True)

# beam-batched vs per-beam dispatch (dsabf search --beam all), conv
# bank, device work + per-call host prep included on both sides.
B = 8
dms = dm_trial_grid(f_lo, f_hi, tsamp, dm_max=250.0, tol=1.25)
delays = delay_table(f_mhz, dms, tsamp)
max_d = int(delays.max())
T_b = 4096
xs = rng.normal(size=(B, T_b + max_d, cfg.n_chan)).astype(np.float32)
span_s = B * T_b * tsamp

b, _ = conv_dedisperse_bank_batch(xs, delays)            # warm batch
fence(_snr_topk_batch_c(b, DEFAULT_WIDTHS, 4)[0])
b1, _ = conv_dedisperse_bank(xs[0], delays)              # warm loop
fence(_snr_topk_c(b1, DEFAULT_WIDTHS, 4)[0])

best_batch = best_loop = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    b, _ = conv_dedisperse_bank_batch(xs, delays)
    fence(_snr_topk_batch_c(b, DEFAULT_WIDTHS, 4)[0])
    best_batch = min(best_batch, time.perf_counter() - t0)
    t0 = time.perf_counter()
    for i in range(B):
        bi, _ = conv_dedisperse_bank(xs[i], delays)
        fence(_snr_topk_c(bi, DEFAULT_WIDTHS, 4)[0])
    best_loop = min(best_loop, time.perf_counter() - t0)

row = {
    "beams": B, "dm_max": 250.0, "n_dm": len(dms), "chunk_T": T_b,
    "batched_s": round(best_batch, 3),
    "batched_rt": round(span_s / best_batch, 2),
    "loop_s": round(best_loop, 3),
    "loop_rt": round(span_s / best_loop, 2),
    "batch_speedup": round(best_loop / best_batch, 2),
}
rows.append(row)
print(json.dumps(row), flush=True)

print(json.dumps({"rows": rows}))
