"""Native I/O engine vs the pure-Python implementations."""

import base64
import io
import threading

import numpy as np
import pytest

native = pytest.importorskip("thrifty_tpu.native")

from thrifty_tpu.dsp import iq  # noqa: E402
from thrifty_tpu.io import card  # noqa: E402


class TestBase64:
    def test_decode_batch_matches_stdlib(self):
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, size=(16, 999), dtype=np.uint8)
        enc = [base64.b64encode(r.tobytes()).decode() for r in raw]
        np.testing.assert_array_equal(native.b64decode_batch(enc), raw)

    def test_encode_matches_stdlib(self):
        rng = np.random.default_rng(1)
        for n in [0, 1, 2, 3, 100, 3000]:
            data = rng.integers(0, 256, size=n, dtype=np.uint8)
            assert native.b64encode(data) == \
                base64.b64encode(data.tobytes()).decode()

    def test_invalid_base64_rejected(self):
        with pytest.raises(ValueError):
            native.b64decode_batch(["!!!!"])

    def test_inconsistent_sizes_rejected(self):
        a = base64.b64encode(bytes(30)).decode()
        b = base64.b64encode(bytes(60)).decode()
        with pytest.raises(ValueError):
            native.b64decode_batch([a, b])


class TestCardParse:
    def test_parse_matches_python(self):
        rng = np.random.default_rng(2)
        raw = rng.integers(0, 256, size=(8, 256), dtype=np.uint8)
        buf = io.StringIO()
        card.write_card(buf, 1.5e9 + np.arange(8), np.arange(8) + 3, raw,
                        header="hdr")
        text = buf.getvalue().encode()
        ts_n, idx_n, raw_n = native.parse_card_bytes(text)
        ts_p, idx_p, raw_p = card.read_card(io.BytesIO(text), native=False)
        np.testing.assert_allclose(ts_n, ts_p)
        np.testing.assert_array_equal(idx_n, idx_p)
        np.testing.assert_array_equal(raw_n, raw_p)

    def test_junk_lines_skipped(self):
        enc = base64.b64encode(bytes(range(16))).decode()
        text = ("# comment\nUsing Volk machine: x\nlinux; y\n"
                "1.5 7 {}\n".format(enc)).encode()
        ts, idx, raw = native.parse_card_bytes(text)
        assert len(ts) == 1 and idx[0] == 7

    def test_empty(self):
        ts, idx, raw = native.parse_card_bytes(b"# nothing\n")
        assert len(ts) == 0

    def test_multithreaded_scan_large_input(self):
        """> 1 MB inputs take the parallel scan path: chunk boundaries
        must not split/drop/duplicate lines, junk interleaved anywhere,
        order preserved."""
        rng = np.random.default_rng(5)
        n = 1200  # ~1.6 MB of text at 1 KB payloads
        payloads = rng.integers(0, 256, size=(n, 1024), dtype=np.uint8)
        lines = []
        for i in range(n):
            if i % 97 == 0:
                lines.append("junk {} line\n".format(i))
            lines.append("{:.6f} {} {}\n".format(
                1.5e9 + i, i,
                base64.b64encode(payloads[i].tobytes()).decode()))
        text = "".join(lines).encode()
        assert len(text) > (1 << 20)
        ts, idx, raw = native.parse_card_bytes(text)
        assert len(ts) == n
        np.testing.assert_array_equal(idx, np.arange(n))
        np.testing.assert_allclose(ts, 1.5e9 + np.arange(n))
        np.testing.assert_array_equal(raw, payloads)
        # And agrees with the single-thread C scan.
        from thrifty_tpu.native import _lib
        ts1 = np.empty(2 * n); idx1 = np.empty(2 * n, np.int64)
        offs1 = np.empty(2 * n, np.int64); lens1 = np.empty(2 * n, np.int64)
        m = _lib.ttpu_card_scan(text, len(text), ts1.ctypes.data,
                                idx1.ctypes.data, offs1.ctypes.data,
                                lens1.ctypes.data, 2 * n)
        assert m == n
        np.testing.assert_array_equal(idx1[:m], idx)


class TestRawConversion:
    def test_matches_python_lut(self):
        rng = np.random.default_rng(3)
        raw = rng.integers(0, 256, size=(4, 2048), dtype=np.uint8)
        np.testing.assert_allclose(
            native.raw_to_iq_f32(raw), iq.raw_to_iq(raw), atol=1e-7)


class TestUnfold:
    def test_overlap_save_semantics(self):
        stream = np.arange(1, 41, dtype=np.uint8)
        blocks = native.unfold(stream, block_bytes=16, history_bytes=6,
                               num_blocks=3)
        assert blocks.shape == (3, 16)
        assert blocks[0, :6].tolist() == [128] * 6
        np.testing.assert_array_equal(blocks[0, 6:], stream[:10])
        np.testing.assert_array_equal(blocks[1, :6], blocks[0, -6:])
        np.testing.assert_array_equal(blocks[2, :6], blocks[1, -6:])


class TestRing:
    def test_producer_consumer(self):
        ring = native.RingBuffer(64)
        payload = np.arange(320, dtype=np.uint64).astype(np.uint8)

        def producer():
            for i in range(0, 320, 32):
                ring.write(payload[i:i + 32])
            ring.close()

        t = threading.Thread(target=producer)
        t.start()
        import time
        time.sleep(0.2)  # let the producer fill the ring first
        out = []
        while True:
            chunk = ring.read(50)
            out.append(chunk)
            if len(chunk) < 50:
                break
        t.join()
        got = np.concatenate(out)
        np.testing.assert_array_equal(got, payload)
        # Writing 320 B through a 64 B ring must have stalled: the
        # overflow counter (real-time margin profiler) sees it.
        assert ring.overflows > 0
        assert ring.histogram().sum() > 0

    def test_read_after_close_returns_short(self):
        ring = native.RingBuffer(16)
        ring.write(np.ones(4, np.uint8))
        ring.close()
        assert len(ring.read(10)) == 4
        assert len(ring.read(10)) == 0


class TestCopyRows:
    def test_matches_numpy_strided_gather(self):
        rng = np.random.default_rng(7)
        src = rng.integers(0, 256, size=1 << 22, dtype=np.uint8)
        for rows, row_bytes, stride, off in (
                (5, 100, 60, 0), (1, 16, 16, 3),
                (300, 22928, 11464, 11464),  # production-shaped, MT path
                (8, 4096, 4096, 128)):
            out = np.empty((rows, row_bytes), np.uint8)
            native.copy_rows(src, off, out, stride)
            want = np.stack([src[off + r * stride:
                                 off + r * stride + row_bytes]
                             for r in range(rows)])
            np.testing.assert_array_equal(out, want)

    def test_bounds_rejected(self):
        src = np.zeros(100, np.uint8)
        out = np.empty((2, 60), np.uint8)
        with pytest.raises(ValueError):
            native.copy_rows(src, 0, out, 50)  # last row ends at 110
        with pytest.raises(ValueError):
            native.copy_rows(src, -1, out, 10)
        with pytest.raises(ValueError):
            native.copy_rows(src, 0, out[:, ::2], 10)  # non-contiguous

    def test_history_must_fit_in_block(self):
        # Regression: the bulk-copy rewrite of ttpu_unfold dropped the
        # per-byte bounds check; history >= block would memset past
        # the output row (review finding) -- now rejected up front.
        with pytest.raises(ValueError):
            native.unfold(np.zeros(10, np.uint8), 100, 201, 1)
        with pytest.raises(ValueError):
            native.unfold(np.zeros(10, np.uint8), 100, 100, 1)
        with pytest.raises(ValueError):
            native.unfold(np.zeros(10, np.uint8), 100, -1, 1)


class TestRingWriteView:
    def test_reserve_commit_round_trip(self):
        ring = native.RingBuffer(64)
        payload = np.arange(200, dtype=np.uint8)
        sent = 0
        out = []

        def producer():
            nonlocal sent
            while sent < len(payload):
                mv = ring.write_view(23)  # odd size exercises wraps
                if mv is None:
                    return
                n = min(len(mv), len(payload) - sent)
                mv[:n] = payload[sent:sent + n].tobytes()
                ring.commit(n)
                sent += n
            ring.close()

        import threading
        t = threading.Thread(target=producer)
        t.start()
        while True:
            chunk = ring.read(17)
            out.append(chunk.copy())
            if len(chunk) < 17:
                break
        t.join()
        np.testing.assert_array_equal(np.concatenate(out), payload)

    def test_view_is_inside_ring_and_closed_returns_none(self):
        ring = native.RingBuffer(32)
        mv = ring.write_view(100)
        assert 0 < len(mv) <= 32
        ring.commit(0)
        ring.close()
        assert ring.write_view(8) is None


class TestSanitizerStress:
    """Build and run the C++ sanitizer stress harness when the
    toolchain supports it (the reference ships no race detection;
    SURVEY.md section 5).  ASan+UBSan only here -- TSan roughly
    doubles the runtime and is covered by `make -C thrifty_tpu/native
    stress` in development."""

    def test_asan_stress(self):
        import os
        import shutil
        import subprocess

        if shutil.which("g++") is None:
            pytest.skip("no g++")
        d = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "thrifty_tpu", "native")
        build = subprocess.run(
            ["make", "-C", d, "stress_asan"],
            capture_output=True, text=True, timeout=300)
        if build.returncode != 0:
            pytest.skip("sanitizer build unavailable: " +
                        build.stderr[-200:])
        run = subprocess.run(
            [os.path.join(d, "stress_asan")],
            env={**os.environ, "ASAN_OPTIONS": "halt_on_error=1"},
            capture_output=True, text=True, timeout=300)
        assert run.returncode == 0, run.stderr[-2000:]
        assert "all checks passed" in run.stdout
