"""Streaming RFI monitor (ops/rfi.py) + the --rfi-auto CLI path:
window pooling, sticky excision, the cap guard, and mid-stream weight
regeneration zeroing the excised channel in the product."""

import json

import numpy as np
import pytest

from dsabeamformer_tpu.ingest.generator import make_noise_block, make_tone_block
from dsabeamformer_tpu.ops.rfi import RFIMonitor


def _tone_infected(cfg, seed, chan=2, amp=6.0):
    w = make_noise_block(cfg, rms=2.0, seed=seed).reshape(
        cfg.t_block, cfg.n_chan, cfg.n_pol, cfg.n_ant).copy()
    tone = make_tone_block(cfg, chan=chan, amplitude=amp).reshape(
        cfg.t_block, cfg.n_chan, cfg.n_pol, cfg.n_ant)
    w[:, chan] = tone[:, chan]
    return w.reshape(cfg.wire_block_shape)


def test_monitor_excises_once_and_stays_sticky(tiny_cfg):
    cfg = tiny_cfg
    events = []
    mon = RFIMonitor(cfg, interval=2, on_event=events.append)
    for s in range(6):
        mon.observe(_tone_infected(cfg, seed=s))
        mon.poll()
    # 3 full windows saw the same carrier; it is excised exactly once
    assert [e["type"] for e in events] == ["excise"]
    assert events[0]["new"] == [2] and events[0]["blocks"] == 2
    assert mon.zapped == {2}


def test_monitor_sampling_and_flush(tiny_cfg):
    cfg = tiny_cfg
    events = []
    mon = RFIMonitor(cfg, interval=4, sample=2, on_event=events.append)
    for s in range(6):  # samples blocks 0,2,4 -> 3 observed < interval
        mon.observe(_tone_infected(cfg, seed=10 + s))
        mon.poll()
    assert events == []  # window never filled
    mon.flush()          # partial window (3 >= 2) decides at EOS
    assert [e["type"] for e in events] == ["excise"]
    assert events[0]["blocks"] == 3


def test_monitor_cap_refuses_wholesale_zap(tiny_cfg):
    cfg = tiny_cfg
    events = []
    # max_fraction tiny -> max_channels=1; two RFI channels trip the cap
    mon = RFIMonitor(cfg, interval=2, max_fraction=0.01,
                     on_event=events.append)
    for s in range(2):
        w = _tone_infected(cfg, seed=20 + s, chan=2).reshape(
            cfg.t_block, cfg.n_chan, cfg.n_pol, cfg.n_ant).copy()
        t5 = make_tone_block(cfg, chan=5, amplitude=6.0).reshape(
            cfg.t_block, cfg.n_chan, cfg.n_pol, cfg.n_ant)
        w[:, 5] = t5[:, 5]
        mon.observe(w.reshape(cfg.wire_block_shape))
        mon.poll()
    assert [e["type"] for e in events] == ["cap"]
    assert mon.zapped == set()  # nothing excised


def test_monitor_seed_not_rereported(tiny_cfg):
    cfg = tiny_cfg
    events = []
    mon = RFIMonitor(cfg, interval=2, on_event=events.append,
                     seed_zapped=[2])
    for s in range(4):
        mon.observe(_tone_infected(cfg, seed=30 + s))
        mon.poll()
    assert events == []  # the carrier channel was already zapped at start


def test_monitor_validation(tiny_cfg):
    with pytest.raises(ValueError):
        RFIMonitor(tiny_cfg, interval=0)
    with pytest.raises(ValueError):
        RFIMonitor(tiny_cfg, sample=0)
    with pytest.raises(ValueError):
        RFIMonitor(tiny_cfg, max_fraction=0.0)


def test_cli_rfi_auto_zeroes_channel_midstream(tiny_cfg, tmp_path, capsys):
    from dsabeamformer_tpu import cli
    from dsabeamformer_tpu.ingest.dada import read_product_file

    cfg = tiny_cfg
    raw = tmp_path / "cap.raw"
    raw.write_bytes(b"".join(
        _tone_infected(cfg, seed=40 + s, chan=6).tobytes() for s in range(6)))
    out = tmp_path / "out.dada"
    rc = cli.main(["run", "--config", "tiny", "--input-file", str(raw),
                   "--output-file", str(out),
                   "--rfi-auto", "--rfi-interval", "1"])
    assert rc == 0
    err = capsys.readouterr().err
    ev_lines = [l for l in err.splitlines() if l.startswith("[dsabf] rfi ")]
    assert ev_lines, err
    ev = json.loads(ev_lines[0][len("[dsabf] rfi "):])
    assert ev["type"] == "excise" and 6 in ev["new"]
    _, powers = read_product_file(out)
    assert powers.shape[0] == 6
    # block 0 ran with the original weights: carrier power present
    assert powers[0, 6].max() > 0
    # by the last block the excision has propagated: exactly zero
    assert powers[-1, 6].max() == 0
    # other channels unaffected throughout
    assert powers[-1, 3].max() > 0


def test_cli_rfi_auto_rejects_prequantized_weights(tiny_cfg, tmp_path,
                                                   capsys):
    from dsabeamformer_tpu import cli

    cfg = tiny_cfg
    raw = tmp_path / "cap.raw"
    raw.write_bytes(make_noise_block(cfg, rms=2.0, seed=1).tobytes())
    wfile = tmp_path / "w.npz"
    assert cli.main(["weights", "--config", "tiny", "--out", str(wfile)]) == 0
    rc = cli.main(["run", "--config", "tiny", "--input-file", str(raw),
                   "--weights", str(wfile), "--rfi-auto"])
    assert rc == 2
    assert "--rfi-auto" in capsys.readouterr().err
