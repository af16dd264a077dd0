"""Multi-host deployment helpers (SURVEY.md §5 "distributed backend").

The reference's full-band deployment split the band across GPUs by
having the packet capture fan out disjoint subbands to each process —
there was no inter-process data path beyond that.  The TPU-native
deployment keeps the same shape at pod scale:

- Each **host** of a multi-host slice runs one capture/ingest process
  and DMAs only its own subband into its local chips (DCN never carries
  voltage data; ICI never carries it either — channels are
  shared-nothing).
- ``jax.distributed.initialize`` + the global channel mesh make the
  per-host arrays one logical sharded array, so the same
  ``sharded_beamformer`` step runs unchanged.

The subband arithmetic below is plain host logic (unit-tested on CPU);
``initialize_multihost`` is the thin runtime entry used on a real pod.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax

from dsabeamformer_tpu.config import ObsConfig


@dataclasses.dataclass(frozen=True)
class HostSubband:
    """The contiguous channel range a host ingests and beamforms."""

    host_index: int
    n_hosts: int
    chan_start: int
    n_chan: int

    def config(self, cfg: ObsConfig) -> ObsConfig:
        """Per-host ObsConfig (correct subband frequencies for weight
        generation)."""
        return cfg.subband(self.chan_start, self.n_chan)


def host_subbands(cfg: ObsConfig, n_hosts: int) -> List[HostSubband]:
    """Disjoint contiguous subband per host — the capture fan-out plan
    (the analog of the reference's per-GPU subband assignment)."""
    if cfg.n_chan % n_hosts:
        raise ValueError(f"n_chan={cfg.n_chan} not divisible by {n_hosts} hosts")
    per = cfg.n_chan // n_hosts
    return [
        HostSubband(h, n_hosts, h * per, per) for h in range(n_hosts)
    ]


def my_subband(cfg: ObsConfig) -> HostSubband:
    """This process's subband under jax.distributed."""
    return host_subbands(cfg, jax.process_count())[jax.process_index()]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed for a multi-host slice.

    On Cloud TPU pods the arguments are auto-detected; pass them
    explicitly elsewhere.  After this, ``parallel.sharding.make_mesh``
    over ``jax.devices()`` spans the full slice and
    ``jax.make_array_from_process_local_data`` assembles each host's
    ingested subband into the global channel-sharded array.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
