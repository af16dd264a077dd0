"""Multi-chip scale-out: channel sharding over an ICI mesh.

The reference scaled out by running one independent process per GPU on
a disjoint 256-channel subband, with no inter-GPU communication at all
(SURVEY.md §2 "multi-device scale-out").  The TPU-native equivalent is
first-class: `shard_map` over a device mesh with the frequency-channel
axis sharded, so the per-channel GEMMs stay embarrassingly parallel and
the main path needs ZERO cross-chip collectives; ICI is exercised only
by the optional band-total-power monitor (a psum) and DCN only by
multi-host ingest fan-out.
"""

from dsabeamformer_tpu.parallel.sharding import (
    make_mesh,
    shard_weights,
    sharded_beamformer,
    sharded_wire_sharding,
)

__all__ = [
    "make_mesh",
    "shard_weights",
    "sharded_beamformer",
    "sharded_wire_sharding",
]
