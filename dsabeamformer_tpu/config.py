"""Observation configuration.

TPU-native replacement for the reference's compile-time constant header
(SURVEY.md L0/C2: ``N_BEAMS``/``N_ANTENNAS``/``N_FREQUENCIES``/
``N_AVERAGING`` C preprocessor macros in ``beamformer.h``): one frozen
dataclass consumed as a jit-static argument, so changing the array
geometry re-traces instead of re-compiling C code.

Wire format
-----------
The on-wire voltage sample is the reference's "4R4I" byte: a packed
complex integer with the **real part in the high nibble** and the
**imaginary part in the low nibble**, each a 4-bit two's-complement value
in [-8, 7] (SURVEY.md §0 step 2).  A wire *block* is a uint8 array in one
of two layouts:

- ``"tfpa"`` — ``[T, F, P, A]`` (time-major): the order a packet capture
  naturally produces, matching the reference's need for a corner-turn
  (SURVEY.md L3).
- ``"ftpa"`` — ``[F, T, P, A]`` (channel-major): the GEMM-friendly order;
  per-channel time series are contiguous, which is the layout the Pallas
  kernel DMAs directly.

``A`` is the zero-padded antenna axis (the GEMM contraction dim) and
``P`` the polarization axis; only ``n_ant_active`` antennas carry signal.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

SPEED_OF_LIGHT_M_S = 299_792_458.0

#: Cold-plasma dispersion: delay_s = DM_CONST_S * DM[pc cm^-3] * f[MHz]^-2
#: (shared by the pulse generator and the quick-look dedisperser).
DM_CONST_S = 4.148808e3


def dm_delays_s(f_mhz, dm: float, ref_mhz: float):
    """Cold-plasma arrival delays [s] of channels ``f_mhz`` relative
    to ``ref_mhz`` (conventionally the top of the band, which arrives
    first).  THE one definition of the curve — the pulse generator and
    the quick-look dedisperser must stay aligned through it."""
    f = np.asarray(f_mhz, np.float64)
    return DM_CONST_S * dm * (f ** -2.0 - float(ref_mhz) ** -2.0)


@dataclasses.dataclass(frozen=True)
class ObsConfig:
    """Static observation + kernel-tiling configuration.

    Instances are hashable and immutable so they can be passed as
    ``jax.jit`` static arguments.
    """

    name: str = "dsa10"
    # --- array geometry (reference: beamformer.h constants, SURVEY.md C2) ---
    n_ant: int = 64            # padded GEMM contraction (K) dim
    n_ant_active: int = 10     # physical dishes carrying signal
    n_beams: int = 256
    n_chan: int = 2048         # channels processed by this instance
    n_chan_total: int = 2048   # channels in the full band (sets sample rate)
    n_pol: int = 2
    # --- streaming block geometry ---
    t_block: int = 2048        # time samples per ingest block
    navg_time: int = 16        # post-detection time averaging (reference N_AVERAGING)
    navg_freq: int = 1         # optional adjacent-channel averaging
    # --- band / beam geometry ---
    f_start_hz: float = 1.28e9
    bandwidth_hz: float = 250e6
    beam_span_deg: float = 2.6   # full fan width, beams uniform in sin(theta)
    # --- kernel tiling / numerics ---
    time_tile: int = 2048        # Pallas grid tile along T (swept on v5e:
                                 # 2048 best with the antenna-sliced K;
                                 # VMEM-bound above at chan_tile=8)
    chan_tile: int = 8           # channels per Pallas grid cell (amortizes
                                 # per-cell grid/DMA overhead; the batched-GEMM
                                 # analog of cublasCgemmBatched's batching)
    weight_mode: str = "int8x2"  # one of: int13 | int12 | int8x2 | int8
                                 #         | bf16 | bf16x2 | f32
    n_ant_compute: int = 0       # antennas the GEMM contracts over; 0 = auto
                                 # (n_ant_active rounded up to 32 — or 16
                                 # for int13, see a_compute — capped at
                                 # n_ant).  Wire slots >= this index MUST be
                                 # zero (they are in the reference's padded
                                 # 4R4I format, SURVEY.md §0), so dropping
                                 # them from K changes nothing numerically
                                 # while skipping MXU passes and VPU unpack
                                 # spent on structural zeros.
    input_layout: str = "tfpa"   # wire layout delivered by the capture
                                 # stage.  'tfpa' (time-major) is consumed
                                 # time-major by the kernel via the
                                 # canonical device form [T, F*P*A]: the
                                 # corner-turn happens in the Pallas
                                 # grid/DMA + an in-kernel lane slice and
                                 # is never materialized (docs/DESIGN.md
                                 # §4; device_wire_shape below)

    def __post_init__(self):
        if self.n_pol != 2:
            raise ValueError("n_pol must be 2 (wire format and epilogue assume dual pol)")
        if self.n_ant_active > self.n_ant:
            raise ValueError("n_ant_active must be <= n_ant")
        if self.t_block % self.time_tile:
            raise ValueError("t_block must be a multiple of time_tile")
        if self.time_tile % self.navg_time:
            raise ValueError("time_tile must be a multiple of navg_time")
        if self.n_chan % self.navg_freq:
            raise ValueError("n_chan must be a multiple of navg_freq")
        if self.n_chan % self.chan_tile:
            raise ValueError("n_chan must be a multiple of chan_tile")
        if self.weight_mode not in ("int13", "int12", "int8x2", "int8",
                                    "bf16", "bf16x2", "f32"):
            raise ValueError(f"unknown weight_mode: {self.weight_mode}")
        if self.input_layout not in ("tfpa", "ftpa"):
            raise ValueError(f"unknown input_layout: {self.input_layout}")
        if self.n_ant_compute:
            if self.n_ant_compute % 8:
                raise ValueError("n_ant_compute must be a multiple of 8")
            if not (self.n_ant_active <= self.n_ant_compute <= self.n_ant):
                raise ValueError(
                    "n_ant_compute must satisfy "
                    "n_ant_active <= n_ant_compute <= n_ant"
                )

    # ------------------------------------------------------------------ #
    # Derived quantities
    # ------------------------------------------------------------------ #

    @property
    def sample_period_s(self) -> float:
        """Per-channel complex sample period of the critically-sampled
        channelizer (DSA-10: 2048 ch / 250 MHz = 8.192 us)."""
        return self.n_chan_total / self.bandwidth_hz

    @property
    def block_duration_s(self) -> float:
        return self.t_block * self.sample_period_s

    @property
    def wire_block_shape(self) -> Tuple[int, int, int, int]:
        if self.input_layout == "tfpa":
            return (self.t_block, self.n_chan, self.n_pol, self.n_ant)
        return (self.n_chan, self.t_block, self.n_pol, self.n_ant)

    @property
    def wire_block_bytes(self) -> int:
        return self.t_block * self.n_chan * self.n_pol * self.n_ant

    @property
    def device_wire_shape(self) -> Tuple[int, ...]:
        """The canonical DEVICE-side wire block shape — what the driver
        should ``device_put`` (a free host-side view of the 4-D capture
        buffer, same bytes).

        Chosen so XLA's default layout for the parameter is exactly the
        fused kernel's operand layout: the minor dimension is a multiple
        of 128 lanes, so no relayout copy is inserted (a 4-D
        ``[..., P, A]`` parameter costs a measured ~2 ms/block relayout
        of the full 537 MB DSA-10 block).

        - ``ftpa``: ``[F, T, P*A]`` — channel-major rows, contiguous DMA.
        - ``tfpa``: ``[T, F*P*A]`` — time-major rows; the kernel reads
          channel tiles straight out of the fused lane axis (the
          corner-turn happens in the Pallas grid/DMA, not as an XLA
          transpose).
        """
        pa = self.n_pol * self.n_ant
        if self.input_layout == "tfpa":
            return (self.t_block, self.n_chan * pa)
        return (self.n_chan, self.t_block, pa)

    @property
    def out_block_shape(self) -> Tuple[int, int, int]:
        """[F/navg_f, T/navg_t, B] float32 averaged beam powers."""
        return (
            self.n_chan // self.navg_freq,
            self.t_block // self.navg_time,
            self.n_beams,
        )

    @property
    def realtime_bytes_per_s(self) -> float:
        """Wire byte rate of a 1x real-time stream for this config."""
        return self.wire_block_bytes / self.block_duration_s

    def freqs_hz(self) -> np.ndarray:
        """Center frequency of each channel processed by this instance.

        A subband instance (``n_chan < n_chan_total``) can be offset via
        ``subband(start)``; the base config covers the band start.
        """
        df = self.bandwidth_hz / self.n_chan_total
        return self.f_start_hz + df * (np.arange(self.n_chan) + 0.5)

    def beam_angles_rad(self) -> np.ndarray:
        """Beam steering angles, uniform in sin(theta) across the fan."""
        half = np.sin(np.deg2rad(self.beam_span_deg / 2.0))
        s = np.linspace(-half, half, self.n_beams)
        return np.arcsin(s)

    def subband(self, chan_start: int, n_chan: int) -> "ObsConfig":
        """Config for a contiguous subband slice (multi-chip sharding)."""
        df = self.bandwidth_hz / self.n_chan_total
        return dataclasses.replace(
            self,
            n_chan=n_chan,
            f_start_hz=self.f_start_hz + chan_start * df,
        )

    def replace(self, **kw) -> "ObsConfig":
        return dataclasses.replace(self, **kw)

    @property
    def a_compute(self) -> int:
        """Resolved GEMM antenna count (see ``n_ant_compute``).

        Auto mode rounds the active count up to 32 (one half-K MXU
        block), except ``int13`` which rounds to 16: its double fold
        multiplies K by 8, so a_compute=16 is exactly one full 128-row
        MXU pass (DSA-10's 10 active paths fit)."""
        if self.n_ant_compute:
            return self.n_ant_compute
        mult = 16 if self.weight_mode == "int13" else 32
        return min(self.n_ant, -(-self.n_ant_active // mult) * mult)

    @property
    def gemm_k(self) -> int:
        """Contraction length of each weight term's GEMM: the complex
        K-concatenation gives 2*A rows; int12 additionally concatenates
        its hi/lo sub-terms along K (the x16 data trick, ops/quantize.py)
        for 4*A rows in a single term, and int13 repeats the fold for
        8*A rows."""
        mult = {"int12": 4, "int13": 8}.get(self.weight_mode, 2)
        return mult * self.a_compute

    # FLOP accounting for MXU-utilization metrics (SURVEY.md §6): per
    # weight term the GEMM is [P*T, gemm_k] @ [gemm_k, 2B] per channel.
    @property
    def macs_per_block(self) -> int:
        """Real multiply-accumulates per block for ONE weight term."""
        return (self.n_pol * self.t_block * self.gemm_k
                * 2 * self.n_beams * self.n_chan)

    @property
    def n_weight_terms(self) -> int:
        return 2 if self.weight_mode in ("int8x2", "bf16x2") else 1


# --------------------------------------------------------------------- #
# Presets (BASELINE.json configs)
# --------------------------------------------------------------------- #

#: DSA-10 full band on one chip: 64 ant (10 active), 256 beams, 2048 chan.
#: t_block=8192 (67 ms of sky, 2.1 GB wire): large blocks amortize the
#: per-dispatch driver/runtime overhead (measured ~1.7 ms/dispatch on
#: the CI relay) to <0.3 ms per 2048 samples; latency is irrelevant at
#: FRB-search timescales and HBM holds depth+1 blocks comfortably.  The
#: Pallas grid still tiles time at time_tile, so VMEM use is unchanged.
DSA10 = ObsConfig(name="dsa10", t_block=8192)

#: DSA-10 with a COMPACT 16-slot wire: same science (10 active dishes,
#: 256 beams, 2048 chan) but the capture packs antennas into 16 slots
#: instead of the reference's 64, cutting the full-band wire rate from
#: 32 GB/s to 8 GB/s — inside a real host's PCIe budget (BENCH.md
#: "Compact wire"; measured 2.03x realtime, same accuracy).  Use when
#: the capture stage is ours to configure; `dsa10` remains the
#: reference-format-compatible preset.
DSA10_COMPACT = DSA10.replace(name="dsa10c", n_ant=16)

#: DSA-110 scale-out config: 110 ant padded to 128, 512 beams
#: (BASELINE.json configs[4]); channel-sharded across a v5e-8 mesh.
DSA110 = ObsConfig(
    name="dsa110",
    n_ant=128,
    n_ant_active=110,
    n_beams=512,
    n_chan=2048,
    n_chan_total=2048,
    # Round-3 sweep (BENCH.md "DSA-110"): t_block=4096 amortizes the
    # per-dispatch relay cost (0.578x -> 0.617x single chip vs 2048;
    # 8192 reaches 0.637x but holds 4.3 GB wire + 2.1 GB output per
    # in-flight block — too tight for depth-2 HBM at full band, fine
    # per-subband on the 8-chip mesh).
    t_block=4096,
    # 4x DSA-10's per-channel working set (K=256, 2B=1024): smaller
    # tiles keep the kernel inside VMEM (tile=1024/fc=4 measured best;
    # fc=8 is neutral, tile=2048 variants blow the scoped-VMEM
    # accumulator [P*tt, 2B] f32 = 16 MB).
    time_tile=1024,
    chan_tile=4,
)

#: Tiny geometry for CPU unit tests (interpret-mode Pallas).
TINY = ObsConfig(
    name="tiny",
    n_ant=16,
    n_ant_active=6,
    n_beams=32,
    n_chan=8,
    n_chan_total=8,
    t_block=64,
    time_tile=32,
    chan_tile=2,
    navg_time=16,
    f_start_hz=1.4e9,
    bandwidth_hz=250e6,
)


def presets() -> dict:
    return {"dsa10": DSA10, "dsa10c": DSA10_COMPACT, "dsa110": DSA110,
            "tiny": TINY}


def shrink_tiles(cfg: ObsConfig, tile_bytes, budget: int, *,
                 min_time_tile: int | None = None,
                 allow_chan: bool = True) -> ObsConfig:
    """Halve ``time_tile`` (then ``chan_tile``) until a kernel variant's
    VMEM working set fits its budget.

    Every detection-kernel variant whose output/intermediate block is
    bigger than the fused power path's (Stokes 4x, voltages
    4*navg_time x, the incoherent side-product) can blow Mosaic's
    scoped-VMEM stack at the presets' fused-tuned tiles; through round
    3 each call site hand-rolled this halving loop with drifting
    conditions (review finding).  One loop, one rule:

    - ``tile_bytes(chan_tile, time_tile)`` returns the variant's
      budget-relevant bytes for candidate tiles;
    - ``time_tile`` halves first (it must stay a multiple of
      ``navg_time``, divide ``t_block``, and stay above
      ``min_time_tile``, default ``navg_time``);
    - then ``chan_tile`` (must divide ``n_chan``) unless
      ``allow_chan=False`` — variants whose working set is
      chan_tile-independent must not shrink the grid for nothing.

    Returns the adjusted config (`cfg` itself if nothing fit or nothing
    needed shrinking); the caller decides how to handle a still-over-
    budget result — e.g. warn with the blocking constraint (cli) or
    proceed and let Mosaic report (validation paths).
    """
    fc, tt = cfg.chan_tile, cfg.time_tile
    floor_tt = cfg.navg_time if min_time_tile is None else min_time_tile
    while tile_bytes(fc, tt) > budget:
        if (tt > floor_tt and (tt // 2) % cfg.navg_time == 0
                and cfg.t_block % (tt // 2) == 0):
            tt //= 2
        elif (allow_chan and fc > 1 and fc % 2 == 0
                and cfg.n_chan % (fc // 2) == 0):
            fc //= 2
        else:
            break
    if (fc, tt) != (cfg.chan_tile, cfg.time_tile):
        cfg = cfg.replace(chan_tile=fc, time_tile=tt)
    return cfg
