"""Scope CLI: triggered frame export from a raw IQ stream."""

import os

import numpy as np

from thrifty_tpu import sim
from thrifty_tpu.dsp import iq
from thrifty_tpu.pipeline import scope


def _write_raw(tmp_path, amplitude, name):
    tpl = sim.make_template()
    cap = sim.synth_capture(
        num_blocks=8, bursts_every=2, template=tpl, amplitude=amplitude,
        noise_std=0.02, seed=3)
    stream = cap.blocks[:, 4920:].reshape(-1)
    path = tmp_path / name
    iq.iq_to_raw(stream).tofile(str(path))
    return str(path)


def test_export_triggered_frames(tmp_path):
    raw = _write_raw(tmp_path, amplitude=0.8, name="hot.bin")
    prefix = str(tmp_path / "frame")
    rc = scope._main([raw, "--export", prefix, "--frames", "3",
                      "--trigger-time", "0.4"])
    assert rc == 0
    frames = [f for f in os.listdir(tmp_path) if f.startswith("frame")]
    assert 1 <= len(frames) <= 3
    assert os.path.getsize(str(tmp_path / sorted(frames)[0])) > 5000


def test_quiet_stream_never_triggers(tmp_path):
    raw = _write_raw(tmp_path, amplitude=0.01, name="quiet.bin")
    prefix = str(tmp_path / "f")
    rc = scope._main([raw, "--export", prefix, "--trigger-time", "0.9",
                      "--trigger-freq", "5"])
    assert rc == 1
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".png")]


def test_free_run_ignores_trigger(tmp_path):
    raw = _write_raw(tmp_path, amplitude=0.01, name="quiet2.bin")
    prefix = str(tmp_path / "fr")
    rc = scope._main([raw, "--export", prefix, "--frames", "2",
                      "--trigger-time", "0.9", "--free-run"])
    assert rc == 0
    assert len([f for f in os.listdir(tmp_path)
                if f.startswith("fr") and f.endswith(".png")]) == 2


def test_trigger_state_machine():
    state = scope.ScopeState(1024, 2.4e6, trigger_time=0.5,
                             trigger_freq=-10.0)
    quiet = np.full(1024, 0.01 + 0.01j, np.complex128)
    assert not state.feed(quiet)
    assert state.frame is None
    hot = quiet.copy()
    hot[100] = 0.9
    assert state.feed(hot)
    assert state.frame is not None
    assert state.frame["mag"].max() > 0.5


def test_mid_stream_ioerror_exits_clean(tmp_path, monkeypatch, capsys):
    """A live source dying mid-stream (e.g. rtl_tcp stall timeout)
    exits via the supervisor-friendly 'stream error' path, matching
    detect/capture, instead of an unhandled traceback."""
    from thrifty_tpu.io import rtl_tcp as rtl_tcp_mod

    class StallSource:
        def __init__(self):
            self._sent = False

        def describe(self):
            return "fake tuner"

        def read(self, n):
            if not self._sent:
                self._sent = True
                return b"\x80" * min(n, 4096)
            raise IOError("rtl_tcp stream stalled (no data for 30.0s)")

        def close(self):
            pass

    monkeypatch.setattr(rtl_tcp_mod, "make_source",
                        lambda *a, **k: StallSource())
    rc = scope._main(["--rtl-tcp", "x:1", "--export",
                      str(tmp_path / "f"), "--frames", "1"])
    assert rc == 1
    assert "stream error:" in capsys.readouterr().err
