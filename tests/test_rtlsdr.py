"""In-process librtlsdr USB binding, exercised against a mock .so.

The mock (thrifty_tpu/native/mock_librtlsdr.c) implements the librtlsdr
ABI subset the binding uses, replaying $MOCK_RTLSDR_FILE through the
async callback -- so these tests cover the same surface the reference's
rtlsdr reader provides (fastcard/rtlsdr_reader.c:60-332): tuner
bring-up with device-table nearest-gain, async producer -> ring ->
consumer, overflow/occupancy accounting, clean and error terminations,
and the full capture CLI path.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.dsp import iq
from thrifty_tpu.io import card
from thrifty_tpu.io.rtlsdr import ByteRing, RtlSdrSource

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "thrifty_tpu", "native")


@pytest.fixture(scope="module")
def mock_lib():
    """Build mock_librtlsdr.so (skip when no C toolchain)."""
    path = os.path.join(NATIVE, "mock_librtlsdr.so")
    res = subprocess.run(["make", "-C", NATIVE, "mock-rtlsdr"],
                         capture_output=True, text=True)
    if res.returncode != 0 or not os.path.exists(path):
        pytest.skip("cannot build mock librtlsdr: " + res.stderr[-500:])
    return path


@pytest.fixture()
def mock_env(mock_lib, monkeypatch):
    monkeypatch.setenv("THRIFTY_LIBRTLSDR", mock_lib)
    monkeypatch.delenv("MOCK_RTLSDR_FILE", raising=False)
    monkeypatch.delenv("MOCK_RTLSDR_FAIL", raising=False)
    monkeypatch.delenv("MOCK_RTLSDR_COUNT", raising=False)
    return mock_lib


def mock_state(mock_lib):
    lib = ctypes.CDLL(mock_lib)
    return {
        "sample_rate": ctypes.c_uint32.in_dll(
            lib, "mock_last_sample_rate").value,
        "center_freq": ctypes.c_uint32.in_dll(
            lib, "mock_last_center_freq").value,
        "gain_mode": ctypes.c_int.in_dll(lib, "mock_last_gain_mode").value,
        "gain": ctypes.c_int.in_dll(lib, "mock_last_gain").value,
        "ppm": ctypes.c_int.in_dll(lib, "mock_last_ppm").value,
        "bias_tee": ctypes.c_int.in_dll(lib, "mock_last_bias_tee").value,
        "resets": ctypes.c_int.in_dll(
            lib, "mock_reset_buffer_calls").value,
    }


class TestTunerBringup:
    def test_nearest_gain_uses_device_table(self, mock_env):
        """25.4 dB against the mock's table {0, 8.7, 19.7, 29.7, 49.6}
        must resolve to 29.7 dB (297) -- proving the binding queried
        rtlsdr_get_tuner_gains rather than the published R820T table
        (whose exact 25.4 dB entry would win there)."""
        src = RtlSdrSource(gain_db=25.4, frequency=433.83e6,
                           sample_rate=2.4e6)
        try:
            assert src.tuner_gain == 297
            assert src.tuner_name == "R820T"
            st = mock_state(mock_env)
            assert st["gain"] == 297
            assert st["gain_mode"] == 1
            assert st["sample_rate"] == 2400000
            assert st["center_freq"] == 433830000
            assert st["resets"] >= 1
            assert "R820T" in src.describe()
            assert "29.7 dB" in src.describe()
        finally:
            src.close()

    def test_auto_gain_and_options(self, mock_env):
        src = RtlSdrSource(gain_db=None, bias_tee=True,
                           freq_correction_ppm=42)
        try:
            assert src.tuner_gain is None
            st = mock_state(mock_env)
            assert st["gain_mode"] == 0
            assert st["bias_tee"] == 1
            assert st["ppm"] == 42
            assert "auto" in src.describe()
            assert "bias-tee" in src.describe()
        finally:
            src.close()

    def test_device_errors(self, mock_env, monkeypatch):
        monkeypatch.setenv("MOCK_RTLSDR_COUNT", "0")
        with pytest.raises(IOError, match="no RTL-SDR devices"):
            RtlSdrSource()
        monkeypatch.setenv("MOCK_RTLSDR_COUNT", "1")
        with pytest.raises(IOError, match="#3 not found"):
            RtlSdrSource(device_index=3)

    def test_missing_library_is_reported(self, monkeypatch, tmp_path):
        monkeypatch.setenv("THRIFTY_LIBRTLSDR",
                           str(tmp_path / "nope.so"))
        # Keep resolution away from any real system librtlsdr.
        monkeypatch.setattr("ctypes.util.find_library", lambda n: None)
        monkeypatch.setattr("thrifty_tpu.io.rtlsdr._SONAMES", ())
        with pytest.raises(OSError, match="librtlsdr not found"):
            RtlSdrSource()


class TestStreaming:
    def test_replays_file_bytes_then_eof(self, mock_env, monkeypatch,
                                         tmp_path):
        data = bytes(range(256)) * 1000
        path = tmp_path / "iq.bin"
        path.write_bytes(data)
        monkeypatch.setenv("MOCK_RTLSDR_FILE", str(path))
        src = RtlSdrSource()
        try:
            got = bytearray()
            while True:
                chunk = src.read(65536)
                if not chunk:
                    break
                got.extend(chunk)
            assert bytes(got) == data
            assert src.read(100) == b""  # EOF is sticky
            assert "Histogram" in src.stats_line()
        finally:
            src.close()

    def test_async_error_surfaces_after_drain(self, mock_env,
                                              monkeypatch, tmp_path):
        """Premature read_async exit (rtlsdr_reader.c:108-113): already-
        buffered samples drain, then the consumer sees IOError."""
        path = tmp_path / "iq.bin"
        path.write_bytes(b"\x80" * (1 << 20))
        monkeypatch.setenv("MOCK_RTLSDR_FILE", str(path))
        monkeypatch.setenv("MOCK_RTLSDR_FAIL", "1")
        src = RtlSdrSource()
        try:
            got = 0
            with pytest.raises(IOError, match="rtlsdr_read_async"):
                while True:
                    chunk = src.read(65536)
                    if not chunk:
                        raise AssertionError("clean EOF on error path")
                    got += len(chunk)
            assert got > 0  # the delivered chunk drained first
        finally:
            src.close()

    def test_close_mid_stream(self, mock_env, monkeypatch, tmp_path):
        path = tmp_path / "iq.bin"
        path.write_bytes(b"\x80" * (1 << 22))
        monkeypatch.setenv("MOCK_RTLSDR_FILE", str(path))
        src = RtlSdrSource(ring_bytes=1 << 16)  # small ring: producer blocks
        src.read(1024)
        src.close()  # must unblock the producer and join cleanly
        assert not src._thread.is_alive()


class TestByteRing:
    def test_overflow_blocks_and_counts(self):
        ring = ByteRing(capacity=16)
        assert ring.put(b"x" * 12)
        done = threading.Event()

        def producer():
            ring.put(b"y" * 12)  # must block until the consumer drains
            done.set()

        t = threading.Thread(target=producer)
        t.start()
        t.join(0.2)
        assert not done.is_set()  # genuinely blocked
        assert ring.overflows == 1
        buf = bytearray(12)
        assert ring.readinto(buf) == 12
        t.join(5.0)
        assert done.is_set()
        assert bytes(buf) == b"x" * 12
        ring.shutdown()
        assert "overflows: 1" in ring.histogram_line()

    def test_histogram_accumulates(self):
        ring = ByteRing(capacity=100)
        for _ in range(5):
            ring.put(b"z" * 10)
        assert sum(ring.histogram) == 5
        assert ring.total_in == 50


class TestCaptureCli:
    def test_capture_rtlsdr_matches_raw_in(self, mock_env, monkeypatch,
                                           tmp_path):
        """`capture --rtlsdr 0` against the mock replaying a synthetic
        burst stream must archive the same gated blocks as
        `capture --raw-in` on the same file (t0 pinned, so timestamps
        and therefore data lines are byte-comparable)."""
        from thrifty_tpu.cli import main

        tpl = sim.make_template()
        cap = sim.synth_capture(num_blocks=12, bursts_every=4,
                                template=tpl, carrier_bin=40.25,
                                amplitude=0.5, noise_std=0.05, seed=33)
        stream = cap.blocks[:, 4920:].reshape(-1)
        raw_path = tmp_path / "rx.bin"
        iq.iq_to_raw(stream).tofile(str(raw_path))
        monkeypatch.setenv("MOCK_RTLSDR_FILE", str(raw_path))

        usb_card = str(tmp_path / "usb.card")
        file_card = str(tmp_path / "file.card")
        common = ["--quiet", "--carrier-window", "7-110", "-k", "0",
                  "--t0", "1.5e9"]
        assert main(["capture", "--rtlsdr", "0", "-o", usb_card]
                    + common) == 0
        assert main(["capture", "--raw-in", str(raw_path), "-o",
                     file_card] + common) == 0

        ts_u, idx_u, raw_u = card.read_card(usb_card)
        ts_f, idx_f, raw_f = card.read_card(file_card)
        np.testing.assert_array_equal(idx_u, idx_f)
        np.testing.assert_array_equal(raw_u, raw_f)
        np.testing.assert_allclose(ts_u, ts_f)
        burst_blocks = {b.block_idx for b in cap.bursts}
        assert burst_blocks <= set(idx_u.tolist())
        with open(usb_card) as f:
            head = f.read(600)
        assert "tuner:" in head  # SDR header line, like --rtl-tcp

    def test_capture_rtlsdr_conflicts(self, mock_env, tmp_path):
        from thrifty_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["capture", "--rtlsdr", "0", "--raw-in", "x.bin"])

    def test_capture_rtlsdr_no_device_exits_1(self, mock_env,
                                              monkeypatch, tmp_path):
        from thrifty_tpu.cli import main

        monkeypatch.setenv("MOCK_RTLSDR_COUNT", "0")
        out = str(tmp_path / "o.card")
        assert main(["capture", "--rtlsdr", "0", "-o", out,
                     "--quiet"]) == 1


class TestScopeCli:
    def test_scope_rtlsdr_exports(self, mock_env, monkeypatch, tmp_path):
        """`scope --rtlsdr 0` frames the mock USB stream and exports."""
        from thrifty_tpu.cli import main

        rng = np.random.default_rng(5)
        n = np.arange(16384 * 6)
        sig = 0.5 * np.exp(2j * np.pi * 40 * n / 16384) \
            + rng.normal(0, 0.05, len(n)) \
            + 1j * rng.normal(0, 0.05, len(n))
        raw_path = tmp_path / "iq.bin"
        iq.iq_to_raw(sig).tofile(str(raw_path))
        monkeypatch.setenv("MOCK_RTLSDR_FILE", str(raw_path))
        prefix = str(tmp_path / "frame")
        assert main(["scope", "--rtlsdr", "0", "--free-run",
                     "--frames", "2", "--export", prefix]) == 0
        import glob
        assert glob.glob(prefix + "*"), "no exported frames"


class TestDetectCli:
    def test_detect_rtlsdr_live(self, mock_env, monkeypatch, tmp_path):
        """`detect --rtlsdr 0` detects the planted bursts from the mock
        USB stream and writes the same .toad as file-based detect."""
        from thrifty_tpu.cli import main
        from thrifty_tpu.io import toad

        tpl = sim.make_template()
        cap = sim.synth_capture(num_blocks=12, bursts_every=4,
                                template=tpl, carrier_bin=40.25,
                                amplitude=0.5, noise_std=0.05, seed=34)
        stream = cap.blocks[:, 4920:].reshape(-1)
        raw_path = tmp_path / "rx.bin"
        iq.iq_to_raw(stream).tofile(str(raw_path))
        tpl_path = tmp_path / "template.npy"
        np.save(str(tpl_path), tpl)
        monkeypatch.setenv("MOCK_RTLSDR_FILE", str(raw_path))

        usb_toad = str(tmp_path / "usb.toad")
        file_toad = str(tmp_path / "file.toad")
        common = ["--quiet", "--carrier-window", "7-110",
                  "--template", str(tpl_path), "--t0", "1.5e9"]
        assert main(["detect", "--rtlsdr", "0", "-o", usb_toad]
                    + common) == 0
        assert main(["detect", str(raw_path), "--raw", "-o", file_toad]
                    + common) == 0
        a, b = toad.load_toad(usb_toad), toad.load_toad(file_toad)
        assert len(a) == len(b) and len(a) >= len(cap.bursts)
        np.testing.assert_array_equal(a["block"], b["block"])
        np.testing.assert_allclose(a["soa"], b["soa"], atol=1e-9)
