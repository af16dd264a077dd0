"""Test harness: force the CPU backend with 8 virtual devices so the
full suite — including multi-chip shard_map tests — runs without TPU
hardware (SURVEY.md §4: "test multi-node without a real cluster").

The axon sitecustomize imports jax and registers a TPU plugin before
pytest starts, so plain env vars are too late in-process; but backend
*initialization* is still lazy, and ``jax.config.update`` below wins as
long as it runs before the first ``jax.devices()`` call.  Pallas kernels
auto-select interpret mode on non-TPU backends (ops/gemm.py).
"""

import os

# Belt and braces for subprocesses spawned by tests.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

#: DSABF_TPU_TESTS=1 opts OUT of the CPU forcing so test_tpu_hw.py can
#: gate a machine with a real TPU (everything else still passes there,
#: just slower and in f32).
_TPU_RUN = os.environ.get("DSABF_TPU_TESTS") == "1"

import jax

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # Full float64 for the device-side weight-phase math (on TPU the
    # same code runs in f32, which the accuracy tests show is
    # sufficient; CPU tests get oracle precision).
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from dsabeamformer_tpu.config import TINY  # noqa: E402

# ---------------------------------------------------------------------------
# Mechanical hardware-gate record (VERDICT r4 #2).
#
# Every TPU-gate run appends ONE JSON line to HWGATES.jsonl at the repo
# root: gate name, git sha, outcome, wall seconds, UTC date.  BENCH.md's
# "what ran on hardware" claims cite that file instead of prose, so the
# record of what executed on the chip can never silently go stale again.
# Only active when DSABF_TPU_TESTS=1 (i.e. an actual hardware run).
# ---------------------------------------------------------------------------

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_HWGATES_PATH = os.environ.get(
    "DSABF_HWGATES_FILE", os.path.join(_REPO_ROOT, "HWGATES.jsonl")
)


def _git_sha():
    import subprocess

    try:
        return subprocess.run(
            ["git", "-C", _REPO_ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


_GIT_SHA = _git_sha() if _TPU_RUN else None


def pytest_runtest_logreport(report):
    if not _TPU_RUN or "test_tpu_hw.py" not in report.nodeid:
        return
    # One line per gate: record the 'call' phase (the test body), or a
    # setup-phase skip/error (a gate that never ran is itself a fact
    # worth recording — it is exactly what went unrecorded in r3/r4).
    if report.when != "call" and not (report.when == "setup" and
                                      report.outcome != "passed"):
        return
    import datetime
    import json

    line = {
        "gate": report.nodeid.split("::", 1)[-1],
        "sha": _GIT_SHA,
        "outcome": report.outcome,
        "wall_s": round(report.duration, 2),
        "date": datetime.datetime.now(datetime.timezone.utc)
                .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "backend": jax.default_backend(),
    }
    if report.when == "setup":
        line["phase"] = "setup"
    try:
        with open(_HWGATES_PATH, "a") as fh:
            fh.write(json.dumps(line) + "\n")
    except OSError:
        pass  # recording must never fail the gate itself


@pytest.fixture(scope="session", autouse=True)
def _check_backend():
    if _TPU_RUN:
        return
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8


@pytest.fixture(scope="session")
def tiny_cfg():
    return TINY


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
