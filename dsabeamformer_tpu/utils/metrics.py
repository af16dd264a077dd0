"""Per-block metrics and the north-star stats line.

Reference behavior (SURVEY.md §5 observability): verbose builds printed
per-block timings via PSRDADA's multilog.  The rebuild's metric stream
IS the north star (BASELINE.json `metric`): per-block ingest GB/s,
real-time factor vs the DSA-10 stream rate, MXU utilization, and
dropped-block counters, as structured records.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import jax

from dsabeamformer_tpu.config import ObsConfig

#: Peak int8 / bf16 MAC rates per chip (MAC/s = OPS/2), used for the
#: MXU-utilization estimate.  Sources: public TPU spec sheets.
_PEAK_MACS = {
    # device_kind substring -> (int8 MAC/s, bf16 MAC/s)
    "v5 lite": (197.0e12, 98.5e12),
    "v5e": (197.0e12, 98.5e12),
    "v5p": (459.0e12, 229.5e12),
    "v4": (137.0e12, 137.0e12),
    "v6 lite": (917.0e12, 459.0e12),
    "v6e": (917.0e12, 459.0e12),
}


def peak_macs_per_s(int8: bool = True) -> Optional[float]:
    """Peak MAC rate for the MXU-utilization estimate.

    The spec table only knows shipped device kinds; on anything else
    set ``DSABF_PEAK_INT8_MACS`` / ``DSABF_PEAK_BF16_MACS`` (MAC/s) —
    an unknown kind otherwise returns None (utilization reported as
    null, never silently wrong).  This is the analytic heartbeat
    number; the measured truth comes from `dsabf trace` (BENCH.md)."""
    import os

    env = os.environ.get(
        "DSABF_PEAK_INT8_MACS" if int8 else "DSABF_PEAK_BF16_MACS"
    )
    if env:
        return float(env)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, (i8, bf16) in _PEAK_MACS.items():
        if key in kind:
            return i8 if int8 else bf16
    return None


def mxu_utilization_both(macs: int, wall_s: float, cfg: ObsConfig,
                         int8: bool = True) -> Optional[dict]:
    """Both MXU-utilization accountings for one measurement, labeled —
    THE one helper every reporter uses (bench.py, the driver stats
    line, `dsabf bench`), so the numbers can never drift.

    - ``issued``: MACs the kernel actually issues (the a_compute-sliced
      contraction) / spec peak — the honest hardware number.
    - ``padded_k``: the reference's formulation, contracting the full
      zero-padded ``n_ant`` K — the same wall time books
      ``n_ant/a_compute`` more nominal MACs (half of them structural
      zeros this kernel never issues).

    Returns None when the device kind has no spec-peak entry
    (`peak_macs_per_s`)."""
    peak = peak_macs_per_s(int8)
    if peak is None or not wall_s:
        return None
    issued = macs / wall_s / peak
    return {
        "issued": issued,
        "padded_k": issued * (cfg.n_ant / cfg.a_compute),
    }


@dataclasses.dataclass
class BlockStats:
    """One record per processed block — the structured analog of the
    reference's verbose per-block print line."""

    block_idx: int
    seq: int                 # ring sequence number (== block_idx for file input)
    wall_s: float            # wall time attributed to this block
    bytes_in: int
    dropped: int             # cumulative ring drops at this point
    skipped: int             # cumulative reader skip-aheads

    def line(self, cfg: ObsConfig) -> str:
        gbs = self.bytes_in / self.wall_s / 1e9 if self.wall_s > 0 else 0.0
        rt = cfg.block_duration_s / self.wall_s if self.wall_s > 0 else 0.0
        return (
            f"block {self.block_idx:6d} seq {self.seq:6d} "
            f"{self.wall_s * 1e3:7.2f} ms  {gbs:6.2f} GB/s  {rt:6.2f}x RT  "
            f"dropped {self.dropped}  skipped {self.skipped}"
        )


@dataclasses.dataclass
class StreamStats:
    """Aggregate over a streaming run — the benchmark record."""

    cfg_name: str
    n_blocks: int = 0
    bytes_in: int = 0
    wall_s: float = 0.0
    dropped: int = 0
    skipped: int = 0
    macs: int = 0
    _t_start: float = dataclasses.field(default_factory=time.perf_counter)

    def finish(self) -> "StreamStats":
        self.wall_s = time.perf_counter() - self._t_start
        return self

    @property
    def gb_per_s(self) -> float:
        return self.bytes_in / self.wall_s / 1e9 if self.wall_s else 0.0

    def realtime_factor(self, cfg: ObsConfig) -> float:
        data_s = self.n_blocks * cfg.block_duration_s
        return data_s / self.wall_s if self.wall_s else 0.0

    def mxu_utilization(self, cfg: ObsConfig,
                        int8: bool = True) -> Optional[dict]:
        """Both labeled accountings (see `mxu_utilization_both`)."""
        return mxu_utilization_both(self.macs, self.wall_s, cfg, int8)

    def record(self, cfg: ObsConfig) -> dict:
        util = self.mxu_utilization(cfg)
        return {
            "config": self.cfg_name,
            "blocks": self.n_blocks,
            "bytes": self.bytes_in,
            "wall_s": round(self.wall_s, 6),
            "gb_per_s": round(self.gb_per_s, 3),
            "realtime_factor": round(self.realtime_factor(cfg), 3),
            # Two labeled accountings, one shared helper (VERDICT r3):
            # issued = what the kernel dispatches; padded_k = the
            # reference's padded-antenna formulation of the same run.
            "mxu_utilization_issued":
                None if util is None else round(util["issued"], 4),
            "mxu_utilization_padded_k":
                None if util is None else round(util["padded_k"], 4),
            "dropped": self.dropped,
            "skipped": self.skipped,
        }

    def json_line(self, cfg: ObsConfig) -> str:
        return json.dumps(self.record(cfg))
