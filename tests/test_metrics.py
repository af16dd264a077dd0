"""Metrics/observability unit tests (SURVEY.md §5: the per-block stats
stream IS the north-star metric)."""

import json
import time

from dsabeamformer_tpu.config import TINY
from dsabeamformer_tpu.utils.bench import run_benchmark
from dsabeamformer_tpu.utils.metrics import BlockStats, StreamStats


def test_block_stats_line_format():
    bs = BlockStats(block_idx=3, seq=5, wall_s=0.002, bytes_in=TINY.wire_block_bytes,
                    dropped=1, skipped=2)
    line = bs.line(TINY)
    assert "block      3" in line and "dropped 1" in line and "skipped 2" in line


def test_stream_stats_record():
    st = StreamStats(cfg_name="tiny")
    st.n_blocks = 4
    st.bytes_in = 4 * TINY.wire_block_bytes
    st.macs = 4 * TINY.macs_per_block * TINY.n_weight_terms
    time.sleep(0.01)
    st.finish()
    rec = st.record(TINY)
    assert rec["blocks"] == 4
    assert rec["gb_per_s"] > 0
    assert rec["realtime_factor"] > 0
    json.loads(st.json_line(TINY))  # valid JSON


def test_realtime_factor_definition():
    """RT factor is time-based: data seconds / wall seconds."""
    st = StreamStats(cfg_name="tiny")
    st.n_blocks = 10
    st.wall_s = 10 * TINY.block_duration_s  # exactly realtime
    assert abs(st.realtime_factor(TINY) - 1.0) < 1e-9


def test_bench_kernel_record_on_cpu():
    rec = run_benchmark(TINY, n_blocks=2, mode="kernel")
    assert rec["mode"] == "kernel"
    assert rec["ms_per_block"] > 0
    assert rec["realtime_factor"] > 0


def test_bench_stream_record_on_cpu():
    rec = run_benchmark(TINY, n_blocks=3, mode="stream")
    assert rec["mode"] == "stream"
    assert rec["blocks"] == 3


def test_trace_capture_and_summary(tmp_path, tiny_cfg):
    """profiling.profile_block_step captures a real device trace and
    returns a per-op duration breakdown (works on the CPU backend)."""
    from dsabeamformer_tpu.utils.profiling import profile_block_step

    rows = profile_block_step(tiny_cfg, n_blocks=2, log_dir=str(tmp_path))
    assert rows and all({"name", "count", "total_ms"} <= set(r) for r in rows)
    assert any("beamform" in r["name"] for r in rows)


def test_cli_trace(tmp_path, capsys):
    import json as _json

    from dsabeamformer_tpu import cli

    rc = cli.main(["trace", "--config", "tiny", "--blocks", "2",
                   "--out", str(tmp_path)])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["ops"]


def test_peak_macs_env_override(monkeypatch):
    from dsabeamformer_tpu.utils import metrics

    monkeypatch.setenv("DSABF_PEAK_INT8_MACS", "1.5e14")
    assert metrics.peak_macs_per_s(True) == 1.5e14
    monkeypatch.setenv("DSABF_PEAK_BF16_MACS", "7.5e13")
    assert metrics.peak_macs_per_s(False) == 7.5e13
