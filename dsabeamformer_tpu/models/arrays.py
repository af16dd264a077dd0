"""Antenna array layouts.

The reference carries an antenna E-W position table compiled into the
binary / loaded from a file (SURVEY.md C2/C8).  The reference mount was
unreadable at survey time, so the concrete coordinates below are
*synthetic but physically plausible* linear east-west layouts; the
framework treats positions as data, so swapping in surveyed coordinates
is a one-line change (``ArrayLayout(positions_m=...)`` or
``ArrayLayout.load``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from dsabeamformer_tpu.config import ObsConfig


@dataclasses.dataclass(frozen=True)
class ArrayLayout:
    """East-west antenna coordinates for a 1-D phased array.

    ``positions_m`` has length ``n_ant`` (the padded GEMM dim); entries
    beyond the active antennas are zero and carry no signal (their wire
    samples are zero, so their weights are irrelevant — but we also zero
    their calibration gains for hygiene).
    """

    positions_m: np.ndarray  # [n_ant] float64
    n_active: int

    @property
    def n_ant(self) -> int:
        return len(self.positions_m)

    @property
    def active_mask(self) -> np.ndarray:
        m = np.zeros(self.n_ant, dtype=bool)
        m[: self.n_active] = True
        return m

    def save(self, path: str) -> None:
        np.savez(path, positions_m=self.positions_m, n_active=self.n_active)

    @staticmethod
    def load(path: str) -> "ArrayLayout":
        d = np.load(path)
        return ArrayLayout(
            positions_m=np.asarray(d["positions_m"], dtype=np.float64),
            n_active=int(d["n_active"]),
        )


def linear_array(n_ant: int, n_active: int, spacing_m: float) -> ArrayLayout:
    pos = np.zeros(n_ant, dtype=np.float64)
    pos[:n_active] = np.arange(n_active) * spacing_m
    # Center the active array so beam phases are balanced around 0.
    pos[:n_active] -= pos[:n_active].mean()
    return ArrayLayout(positions_m=pos, n_active=n_active)


def array_for(cfg: ObsConfig) -> ArrayLayout:
    """Default layout for a config preset.

    DSA-10: 10 dishes on an E-W line, ~5 m pitch (4.5 m dishes).
    DSA-110: 110 dishes, same pitch class.  Synthetic coordinates — see
    module docstring.
    """
    spacing = 5.0
    return linear_array(cfg.n_ant, cfg.n_ant_active, spacing)
