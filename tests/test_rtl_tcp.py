"""rtl_tcp client: protocol handshake, nearest-gain semantics, and the
live capture/detect CLI paths against an in-test fake server.

The fake implements the server side of librtlsdr's rtl_tcp protocol:
banner (magic + tuner type + gain count), 5-byte SET_* commands, then
a raw uint8 I/Q stream.  Mirrors the reference's SDR front-end tests
hardware-for-hardware (fastcard/rtlsdr_reader.c:201-297).
"""

import socket
import struct
import threading

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.cli import main
from thrifty_tpu.dsp import iq
from thrifty_tpu.io import card, rtl_tcp, toad

HISTORY = 4920


class FakeRtlTcpServer:
    """One-shot rtl_tcp server: banner -> record commands -> stream."""

    def __init__(self, payload=b"", tuner_type=5, gain_count=29,
                 magic=b"RTL0", port=0):
        self.payload = payload
        self.tuner_type = tuner_type
        self.gain_count = gain_count
        self.magic = magic
        self.commands = []
        self._sock = socket.socket()
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", port))
        self._sock.listen(1)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._sock.accept()
        conn.sendall(self.magic + struct.pack(
            ">II", self.tuner_type, self.gain_count))
        # The client sends its whole SET_* sequence during __init__
        # before it starts reading; drain commands until a short idle.
        conn.settimeout(0.25)
        buf = b""
        try:
            while True:
                chunk = conn.recv(4096)
                if not chunk:
                    break
                buf += chunk
        except socket.timeout:
            pass
        for i in range(0, len(buf) - len(buf) % 5, 5):
            op, arg = struct.unpack(">BI", buf[i:i + 5])
            self.commands.append((op, arg))
        conn.settimeout(None)
        try:
            conn.sendall(self.payload)
            conn.shutdown(socket.SHUT_WR)
            # Linger until the client closes so it never sees ECONNRESET
            # mid-payload.
            conn.settimeout(5.0)
            while conn.recv(4096):
                pass
        except OSError:
            pass
        conn.close()
        self._sock.close()

    def join(self):
        self._thread.join(timeout=10.0)


def test_nearest_gain_reference_semantics():
    # Exact value
    assert rtl_tcp.nearest_gain(77, rtl_tcp.TUNER_GAINS[5]) == 77
    # Between 77 and 87: 81 -> 77, 83 -> 87
    assert rtl_tcp.nearest_gain(81, rtl_tcp.TUNER_GAINS[5]) == 77
    assert rtl_tcp.nearest_gain(83, rtl_tcp.TUNER_GAINS[5]) == 87
    # Exact midpoint keeps the earlier entry (strict < in the
    # reference's scan, rtlsdr_reader.c:47-52): midpoint of 77/87.
    assert rtl_tcp.nearest_gain(82, rtl_tcp.TUNER_GAINS[5]) == 77
    # Clipping to the table ends
    assert rtl_tcp.nearest_gain(-500, rtl_tcp.TUNER_GAINS[1]) == -10
    assert rtl_tcp.nearest_gain(9999, rtl_tcp.TUNER_GAINS[5]) == 496
    # Empty table (unknown tuner) -> 0
    assert rtl_tcp.nearest_gain(100, ()) == 0


def test_parse_hostport():
    assert rtl_tcp.parse_hostport("radio:2001") == ("radio", 2001)
    assert rtl_tcp.parse_hostport("radio") == ("radio", 1234)
    # IPv6: bracket syntax with/without port, and a bare literal.
    assert rtl_tcp.parse_hostport("[::1]:2001") == ("::1", 2001)
    assert rtl_tcp.parse_hostport("[::1]") == ("::1", 1234)
    assert rtl_tcp.parse_hostport("[fe80::2]:") == ("fe80::2", 1234)
    assert rtl_tcp.parse_hostport("fe80::2") == ("fe80::2", 1234)
    # Malformed inputs are readable ValueErrors, not tracebacks from
    # int('') -- make_source_cli maps them to 'stream error:' exit 1.
    for bad in ("radio:", "radio:abc", "[::1", "[::1]x"):
        with pytest.raises(ValueError):
            rtl_tcp.parse_hostport(bad)


def test_handshake_and_stream():
    srv = FakeRtlTcpServer(payload=bytes(range(256)) * 4)
    src = rtl_tcp.RtlTcpSource("127.0.0.1", srv.port, frequency=433.83e6,
                               sample_rate=2.4e6, gain_db=7.5,
                               bias_tee=True)
    got = b""
    while True:
        chunk = src.read(300)
        if not chunk:
            break
        got += chunk
    src.close()
    srv.join()
    assert got == bytes(range(256)) * 4
    assert src.tuner_name == "R820T"
    # Init sequence mirrors rtlsdr_reader.c:253-291: sample rate,
    # frequency, manual gain mode, nearest gain, then bias tee.
    assert srv.commands == [
        (rtl_tcp.CMD_SET_SAMPLE_RATE, 2400000),
        (rtl_tcp.CMD_SET_FREQ, 433830000),
        (rtl_tcp.CMD_SET_GAIN_MODE, 1),
        (rtl_tcp.CMD_SET_GAIN, 77),  # nearest_gain(75) on R820T
        (rtl_tcp.CMD_SET_BIAS_TEE, 1),
    ]
    assert src.tuner_gain == 77


def test_auto_gain_mode():
    srv = FakeRtlTcpServer()
    src = rtl_tcp.RtlTcpSource("127.0.0.1", srv.port, gain_db=None)
    while src.read(4096):
        pass
    src.close()
    srv.join()
    assert (rtl_tcp.CMD_SET_GAIN_MODE, 0) in srv.commands
    assert all(op != rtl_tcp.CMD_SET_GAIN for op, _ in srv.commands)
    assert src.tuner_gain is None


def test_negative_gain_wraps_u32():
    srv = FakeRtlTcpServer(tuner_type=1, gain_count=14)  # E4000
    src = rtl_tcp.RtlTcpSource("127.0.0.1", srv.port, gain_db=-1.0)
    while src.read(4096):
        pass
    src.close()
    srv.join()
    gains = dict(srv.commands)
    assert gains[rtl_tcp.CMD_SET_GAIN] == (-10) & 0xFFFFFFFF


def test_bad_magic_rejected():
    srv = FakeRtlTcpServer(magic=b"HTTP")
    with pytest.raises(IOError):
        rtl_tcp.RtlTcpSource("127.0.0.1", srv.port)


@pytest.fixture(scope="module")
def burst_stream():
    """Raw uint8 I/Q bytes of a small capture with known bursts."""
    tpl = sim.make_template()
    cap = sim.synth_capture(num_blocks=20, bursts_every=4, template=tpl,
                            seed=3)
    return iq.iq_to_raw(
        cap.blocks[:, HISTORY:].reshape(-1)).tobytes(), tpl


def test_capture_cli_rtl_tcp(burst_stream, tmp_path):
    payload, _ = burst_stream
    srv = FakeRtlTcpServer(payload=payload)
    out = tmp_path / "live.card"
    assert main(["capture", "--rtl-tcp", "127.0.0.1:%d" % srv.port,
                 "-o", str(out), "--quiet", "-k", "0",
                 "--carrier-window", "7-110"]) == 0
    srv.join()
    # Tuner configured from settings (defaults: 433.83M, gain 0 ->
    # nearest R820T gain 0).
    assert (rtl_tcp.CMD_SET_FREQ, 433830000) in srv.commands
    assert (rtl_tcp.CMD_SET_GAIN, 0) in srv.commands
    header = [l for l in open(out) if l.startswith("#")]
    assert any("tuner:" in l for l in header), "SDR header line missing"
    ts, idx, blocks = card.read_card(str(out))
    assert 0 < len(idx) < 20, "carrier gating should thin the stream"


def test_detect_cli_rtl_tcp_matches_file(burst_stream, tmp_path):
    """Live rtl_tcp detect == offline detect of the same stream."""
    payload, tpl = burst_stream
    np.save(tmp_path / "tpl.npy", tpl)
    raw = tmp_path / "stream.bin"
    raw.write_bytes(payload)
    common = ["--quiet", "--template", str(tmp_path / "tpl.npy"),
              "--carrier-window", "7-110"]
    assert main(["detect", str(raw), "--raw", "-o",
                 str(tmp_path / "file.toad")] + common) == 0
    srv = FakeRtlTcpServer(payload=payload)
    assert main(["detect", "--rtl-tcp", "127.0.0.1:%d" % srv.port,
                 "-o", str(tmp_path / "live.toad")] + common) == 0
    srv.join()
    f = toad.load_toad(str(tmp_path / "file.toad"))
    l = toad.load_toad(str(tmp_path / "live.toad"))
    assert len(f) == len(l) > 0
    for col in ("block", "sample", "soa"):
        np.testing.assert_array_equal(f[col], l[col])


def test_scope_cli_rtl_tcp(burst_stream, tmp_path):
    """Live scope over rtl_tcp: triggered frames export headlessly
    (the role of the reference's GNU Radio scope.grc)."""
    payload, _ = burst_stream
    srv = FakeRtlTcpServer(payload=payload)
    assert main(["scope", "--rtl-tcp", "127.0.0.1:%d" % srv.port,
                 "--export", str(tmp_path / "frame"), "--frames", "2"]) == 0
    srv.join()
    assert (tmp_path / "frame0000.png").stat().st_size > 1000


class TwoSessionServer:
    """Accepts twice: sends the first half, drops, then the rest."""

    def __init__(self, payload, split=None):
        if split is None:
            split = len(payload) // 2
        self.h1, self.h2 = payload[:split], payload[split:]
        self.commands = []
        self._sock = socket.socket()
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(2)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _session(self, data):
        conn, _ = self._sock.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
        conn.settimeout(0.25)
        try:
            while conn.recv(4096):
                pass
        except socket.timeout:
            pass
        conn.settimeout(None)
        try:
            conn.sendall(data)
            conn.shutdown(socket.SHUT_WR)
            conn.settimeout(5.0)
            while conn.recv(4096):
                pass
        except OSError:
            pass
        conn.close()

    def _serve(self):
        self._session(self.h1)
        self._session(self.h2)
        self._sock.close()

    def join(self):
        self._thread.join(timeout=20.0)


def test_reconnecting_source_splices_sessions():
    payload = bytes(range(256)) * 8
    srv = TwoSessionServer(payload)
    src = rtl_tcp.ReconnectingRtlTcpSource(
        "127.0.0.1", srv.port, max_retries=2, initial_backoff_s=0.05)
    got = b""
    # After both sessions drain and no server is left, exhausting the
    # retries must RAISE (a live stream has no legitimate EOF), not
    # fake a clean end-of-stream.
    with pytest.raises(IOError):
        while True:
            chunk = src.read(512)
            if not chunk:
                break
            got += chunk
    src.close()
    srv.join()
    assert got == payload, "bytes lost or reordered across reconnect"
    assert src.reconnects == 1


def test_reconnect_odd_byte_splice_keeps_iq_pairing():
    """A session dying after an ODD byte count must not swap I/Q for
    the rest of the run: the wrapper pads one neutral byte (128) so
    the next session's first I byte lands on an even stream offset."""
    payload = bytes(range(256)) * 4
    srv = TwoSessionServer(payload, split=333)  # odd first session
    src = rtl_tcp.ReconnectingRtlTcpSource(
        "127.0.0.1", srv.port, max_retries=2, initial_backoff_s=0.05)
    got = b""
    with pytest.raises(IOError):
        while True:
            chunk = src.read(512)
            if not chunk:
                break
            got += chunk
    src.close()
    srv.join()
    assert got == payload[:333] + b"\x80" + payload[333:]
    # Every session-2 byte sits at the same even/odd offset it had on
    # the wire, so (I, Q) pairing is preserved across the splice.
    assert (333 + 1) % 2 == 0
    assert src.reconnects == 1


def test_initial_connect_retries_with_backoff():
    """The reconnect budget covers the INITIAL connection too: at boot
    the radio host comes up independently, so the client must retry
    'connection refused' with backoff instead of crashing."""
    import time

    placeholder = socket.socket()
    placeholder.bind(("127.0.0.1", 0))
    port = placeholder.getsockname()[1]
    placeholder.close()  # now refused until the server appears

    holder = {}

    def start_later():
        time.sleep(0.3)
        holder["srv"] = FakeRtlTcpServer(payload=b"\x80\x80\x80\x80",
                                         port=port)

    t = threading.Thread(target=start_later)
    t.start()
    src = rtl_tcp.ReconnectingRtlTcpSource(
        "127.0.0.1", port, max_retries=8, initial_backoff_s=0.05)
    reconnects_at_connect = src.reconnects
    got = b""
    # Draining past the payload exhausts the (now refused) retries and
    # raises -- a live stream has no legitimate EOF.
    with pytest.raises(IOError):
        while True:
            got += src.read(64)
    src.close()
    t.join(timeout=10.0)
    holder["srv"].join()
    assert got == b"\x80\x80\x80\x80"
    assert reconnects_at_connect == 0  # initial tries aren't reconnects


def test_initial_connect_budget_exhausted_raises_ioerror():
    placeholder = socket.socket()
    placeholder.bind(("127.0.0.1", 0))
    port = placeholder.getsockname()[1]
    placeholder.close()
    with pytest.raises(IOError, match="connect failed after 3"):
        rtl_tcp.ReconnectingRtlTcpSource(
            "127.0.0.1", port, max_retries=2, initial_backoff_s=0.01)


def test_detect_cli_initial_connect_failure_exits_nonzero(
        burst_stream, tmp_path, capsys):
    """A dead radio host at startup exits via the 'stream error' path
    (supervisor-restartable), not a traceback."""
    _, tpl = burst_stream
    np.save(tmp_path / "tpl.npy", tpl)
    placeholder = socket.socket()
    placeholder.bind(("127.0.0.1", 0))
    port = placeholder.getsockname()[1]
    placeholder.close()
    assert main(["detect", "--rtl-tcp", "127.0.0.1:%d" % port,
                 "--reconnect", "1", "--quiet",
                 "--template", str(tmp_path / "tpl.npy"),
                 "-o", str(tmp_path / "x.toad")]) == 1
    assert "stream error:" in capsys.readouterr().err


class CrashLoopServer:
    """Completes the handshake, then closes -- over and over.

    Models a dongle that fails right after init: every connect
    SUCCEEDS but no session ever delivers a sample.
    """

    def __init__(self):
        self.accepts = 0
        self._sock = socket.socket()
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(8)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        self._sock.settimeout(0.1)
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            self.accepts += 1
            try:
                conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
                conn.settimeout(0.2)
                try:
                    while conn.recv(4096):
                        pass
                except socket.timeout:
                    pass
            except OSError:
                pass
            conn.close()
        self._sock.close()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=10.0)


def test_crash_loop_server_exhausts_retries():
    """Connects that succeed but EOF before any data must consume the
    retry budget (with backoff), not loop forever at full speed."""
    srv = CrashLoopServer()
    try:
        src = rtl_tcp.ReconnectingRtlTcpSource(
            "127.0.0.1", srv.port, max_retries=3,
            initial_backoff_s=0.01)
        with pytest.raises(IOError, match="3 attempts"):
            src.read(512)
        src.close()
        # initial connect + 3 budgeted reconnects, nothing more
        assert srv.accepts <= 4 + 1  # +1: accept raced with close
    finally:
        srv.stop()


def test_detect_cli_rtl_tcp_reconnect(burst_stream, tmp_path):
    """detect --rtl-tcp --reconnect rides out a server restart and
    produces the same detections as the uninterrupted stream."""
    payload, tpl = burst_stream
    np.save(tmp_path / "tpl.npy", tpl)
    common = ["--quiet", "--template", str(tmp_path / "tpl.npy"),
              "--carrier-window", "7-110"]
    srv1 = FakeRtlTcpServer(payload=payload)
    assert main(["detect", "--rtl-tcp", "127.0.0.1:%d" % srv1.port,
                 "-o", str(tmp_path / "one.toad")] + common) == 0
    srv1.join()
    srv2 = TwoSessionServer(payload)
    # The stream has no further server after session 2, so exhausting
    # the reconnect retries exits non-zero with the output flushed.
    assert main(["detect", "--rtl-tcp", "127.0.0.1:%d" % srv2.port,
                 "--reconnect", "2",
                 "-o", str(tmp_path / "two.toad")] + common) == 1
    srv2.join()
    a = toad.load_toad(str(tmp_path / "one.toad"))
    b = toad.load_toad(str(tmp_path / "two.toad"))
    assert len(a) == len(b) > 0
    np.testing.assert_array_equal(a["soa"], b["soa"])


class MultiSessionServer(TwoSessionServer):
    """N sessions, arbitrary split points."""

    def __init__(self, payload, splits):
        bounds = [0] + sorted(splits) + [len(payload)]
        self.parts = [payload[a:b] for a, b in zip(bounds, bounds[1:])]
        self.commands = []
        self._sock = socket.socket()
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(2)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        for part in self.parts:
            self._session(part)
        self._sock.close()


def test_reconnect_many_random_even_drops():
    """Fuzz: a recorded stream split into N sessions at random EVEN
    offsets splices back to exactly the original bytes (even splits
    preserve content; odd splits legitimately re-align, covered by the
    dedicated odd-splice test)."""
    rng = np.random.default_rng(42)
    payload = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    for trial in range(3):
        n_splits = int(rng.integers(2, 6))
        splits = sorted(set(
            int(s) * 2 for s in rng.integers(1, len(payload) // 2,
                                             size=n_splits)))
        srv = MultiSessionServer(payload, splits)
        src = rtl_tcp.ReconnectingRtlTcpSource(
            "127.0.0.1", srv.port, max_retries=3,
            initial_backoff_s=0.05)
        got = b""
        with pytest.raises(IOError):
            while True:
                got += src.read(int(rng.integers(100, 9000)))
        src.close()
        srv.join()
        assert got == payload, \
            "trial %d splits %r: splice corrupted" % (trial, splits)
        assert src.reconnects == len(splits)


def test_ppm_forwarded_to_dongle(burst_stream, tmp_path):
    _, tpl = burst_stream
    np.save(tmp_path / "tpl.npy", tpl)
    srv = FakeRtlTcpServer(payload=b"\x80" * 4096)
    assert main(["detect", "--rtl-tcp", "127.0.0.1:%d" % srv.port,
                 "--ppm", "-12", "--quiet",
                 "--template", str(tmp_path / "tpl.npy"),
                 "-o", str(tmp_path / "x.toad")]) == 0
    srv.join()
    # u32-wrapped exactly as librtlsdr's server reads it back.
    assert (rtl_tcp.CMD_SET_FREQ_CORRECTION,
            (-12) & 0xFFFFFFFF) in srv.commands


def test_close_stops_reconnecting():
    """read after close() must fail, not silently reopen the radio:
    the reconnect wrapper used to treat the EBADF from its own
    shutdown as a stream failure and re-dial the server."""
    srv = FakeRtlTcpServer(payload=bytes(512))
    src = rtl_tcp.ReconnectingRtlTcpSource(
        "127.0.0.1", srv.port, max_retries=3, initial_backoff_s=0.01,
        frequency=433.83e6, sample_rate=2.4e6)
    assert len(src.read(64)) == 64
    src.close()
    with pytest.raises(IOError, match="closed"):
        src.read(64)
    assert src.reconnects == 0
    srv.join()
