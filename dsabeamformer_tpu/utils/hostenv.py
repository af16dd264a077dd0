"""Host-environment helpers shared by the benchmark/soak scripts and
the soak tests: persistent-compile-cache setup, TPU-backend guard, and
process-RSS reading (the memory-stability metric in BENCH.md).

These existed as per-script copies through round 3; a change to the
cache env var, the backend-guard message, or the RSS parsing had to be
made in five places (review finding).  One module, one behavior.
"""

from __future__ import annotations

import os
import sys

__all__ = ["enable_jax_cache", "require_tpu_backend", "process_rss_mb"]


def enable_jax_cache() -> None:
    """Point jax at the persistent compilation cache (``DSABF_JAX_CACHE``,
    default ``/tmp/dsabf-jax-cache``) so repeated runs skip the 1-5 min
    remote Mosaic compile.  Safe no-op on jax versions without the
    config knobs."""
    import jax

    cache_dir = os.environ.get("DSABF_JAX_CACHE", "/tmp/dsabf-jax-cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def require_tpu_backend() -> bool:
    """True iff the default jax backend is a real accelerator.  Prints
    the standard diagnosis otherwise: the TPU relay registers through a
    sitecustomize on PYTHONPATH, so overwriting PYTHONPATH (instead of
    prepending to it) silently drops the process to the CPU backend and
    produces garbage benchmark numbers."""
    import jax

    if jax.default_backend() == "cpu":
        print(
            "FATAL: landed on the CPU backend — check PYTHONPATH includes "
            "/root/.axon_site (prepend, never replace)",
            file=sys.stderr,
        )
        return False
    return True


def process_rss_mb() -> float:
    """This process's resident set size in MB (VmRSS — includes touched
    shared-memory ring pages, which is what the soak's host-RAM sizing
    claims are about)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0
