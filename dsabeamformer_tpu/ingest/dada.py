"""Stream-header encode/parse (the DADA-header analog).

Reference behavior (SURVEY.md L1, §3.1): a PSRDADA stream starts with a
text header of ``KEY value`` lines (observation parameters), parsed once
to sanity-check against the compiled-in constants.  The rebuild keeps
the same convention on the dsaring header area, generated from and
validated against ``ObsConfig``.
"""

from __future__ import annotations

from typing import Dict

from dsabeamformer_tpu.config import ObsConfig

_HEADER_VERSION = "1.0"


def encode_header(cfg: ObsConfig, **extra) -> str:
    kv = {
        "HDR_VERSION": _HEADER_VERSION,
        "INSTRUMENT": "dsabeamformer_tpu",
        "CONFIG": cfg.name,
        "NANT": cfg.n_ant,
        "NANT_ACTIVE": cfg.n_ant_active,
        "NBEAM": cfg.n_beams,
        "NCHAN": cfg.n_chan,
        "NCHAN_TOTAL": cfg.n_chan_total,
        "NPOL": cfg.n_pol,
        "TBLOCK": cfg.t_block,
        "NAVG_TIME": cfg.navg_time,
        "NAVG_FREQ": cfg.navg_freq,
        "FREQ_START_HZ": repr(cfg.f_start_hz),
        "BW_HZ": repr(cfg.bandwidth_hz),
        "ORDER": cfg.input_layout.upper(),
        "BLOCK_BYTES": cfg.wire_block_bytes,
    }
    kv.update(extra)
    return "".join(f"{k} {v}\n" for k, v in kv.items())


def parse_header(text: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(None, 1)
        if len(parts) == 2:
            out[parts[0]] = parts[1]
    return out


def validate_header(cfg: ObsConfig, text: str) -> None:
    """Raise ValueError if the stream header disagrees with the config
    (the reference's start-of-stream sanity check)."""
    h = parse_header(text)
    checks = {
        "NANT": cfg.n_ant,
        "NBEAM": cfg.n_beams,
        "NCHAN": cfg.n_chan,
        "NPOL": cfg.n_pol,
        "TBLOCK": cfg.t_block,
        "BLOCK_BYTES": cfg.wire_block_bytes,
        "ORDER": cfg.input_layout.upper(),
    }
    for key, want in checks.items():
        if key not in h:
            raise ValueError(f"stream header missing {key}")
        if str(h[key]) != str(want):
            raise ValueError(
                f"stream header {key}={h[key]} != config {want} "
                f"(config {cfg.name!r})"
            )
