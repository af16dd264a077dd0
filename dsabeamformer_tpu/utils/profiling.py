"""Profiler integration (SURVEY.md §5 tracing/profiling).

The reference relied on CUDA events + external nvprof timelines; the
TPU-native equivalents are ``jax.profiler`` traces (viewable in
XProf/TensorBoard/Perfetto) plus the per-block metrics stream
(utils/metrics.py).  The ≥50% MXU target must be *measured*: use
``trace()`` around a few streaming blocks and read the MXU utilization
from the trace, or use the analytic estimate in ``StreamStats``.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/dsabf-trace"):
    """Context manager: capture a device trace around the enclosed block.

    View with: ``tensorboard --logdir <log_dir>`` (profile plugin) or
    upload the contained ``.trace.json.gz``/``xplane`` to Perfetto/XProf.
    """
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
