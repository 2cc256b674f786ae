"""Threaded streaming ingestion (ring-buffer pump)."""

import io

import numpy as np
import pytest

pytest.importorskip("thrifty_tpu.native")

from thrifty_tpu.io import blocks as blocks_io  # noqa: E402
from thrifty_tpu.io.stream import StreamPump  # noqa: E402


def make_stream(n_bytes, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=n_bytes, dtype=np.uint8).tobytes()


class TestPrefetchIter:
    def test_order_preserved(self):
        from thrifty_tpu.io.stream import prefetch_iter
        assert list(prefetch_iter(iter(range(100)), depth=3)) \
            == list(range(100))

    def test_exception_propagates(self):
        from thrifty_tpu.io.stream import prefetch_iter

        def boom():
            yield 1
            raise RuntimeError("producer failed")

        it = prefetch_iter(boom())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="producer failed"):
            list(it)

    def test_empty(self):
        from thrifty_tpu.io.stream import prefetch_iter
        assert list(prefetch_iter(iter([]))) == []


class TestStreamPump:
    def test_matches_synchronous_reader(self):
        size, history, batch = 256, 64, 4
        data = make_stream((2 * size - 2 * history) * 13)

        pump = StreamPump(io.BytesIO(data), size, history, batch,
                          timestamper=lambda: 0.0)
        pumped = list(pump.batches())

        sync = list(blocks_io.raw_batches(
            io.BytesIO(data), size, history, batch,
            timestamper=lambda: 0.0))

        assert len(pumped) == len(sync)
        for (ts_a, idx_a, raw_a), (ts_b, idx_b, raw_b) in zip(pumped, sync):
            np.testing.assert_array_equal(idx_a, idx_b)
            np.testing.assert_array_equal(raw_a, raw_b)

    def test_zero_history_live_stream(self):
        # history=0 through the fused ring path: the tail splice with
        # `[-0:]` selected the whole row and broke the second batch.
        size, history, batch = 64, 0, 3
        data = make_stream(2 * size * 8)

        class NoFileno(io.BytesIO):
            def fileno(self):  # force the ring path (not mmap)
                raise OSError("not a file")

        pump = StreamPump(NoFileno(data), size, history, batch,
                          timestamper=lambda: 0.0)
        got = list(pump.batches())
        raw = np.concatenate([b[2] for b in got])
        assert raw.shape == (8, 2 * size)
        np.testing.assert_array_equal(
            raw.reshape(-1), np.frombuffer(data, dtype=np.uint8))

    def test_large_history_exact(self, tmp_path):
        # history > block/2 (hist_bytes > new_bytes): rows need stream
        # bytes spanning MORE than one previous block's new samples.
        # The fused ring kernel refuses this geometry; the fallback
        # strided-scratch path, the sync reader, and the mmap path must
        # all agree byte-for-byte (a 128-filled-history regression here
        # silently bifurcates pipe vs file detections).
        size, history, batch = 128, 100, 5
        new_bytes = 2 * (size - history)
        data = make_stream(new_bytes * 17 + 3)  # odd tail dropped

        sync = list(blocks_io.raw_batches(
            io.BytesIO(data), size, history, batch,
            timestamper=lambda: 0.0))
        pumped = [
            (ts.copy(), idx.copy(), raw.copy())
            for ts, idx, raw in StreamPump(
                io.BytesIO(data), size, history, batch,
                t0=0.0).batches()]
        p = tmp_path / "bighist.raw"
        p.write_bytes(data)
        with open(p, "rb") as f:
            pump = StreamPump(f, size, history, batch, t0=0.0)
            assert pump._mm is not None
            mm = [(ts.copy(), idx.copy(), raw.copy())
                  for ts, idx, raw in pump.batches()]

        assert len(pumped) == len(sync) == len(mm)
        for (_, i1, r1), (_, i2, r2), (_, i3, r3) in zip(
                sync, pumped, mm):
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_array_equal(r1, r2)
            np.testing.assert_array_equal(i1, i3)
            np.testing.assert_array_equal(r1, r3)

    def test_partial_final_batch(self):
        size, history, batch = 128, 32, 8
        new_bytes = 2 * (size - history)
        data = make_stream(new_bytes * 10)  # 10 blocks -> batches of 8+2
        pump = StreamPump(io.BytesIO(data), size, history, batch,
                          timestamper=lambda: 0.0)
        sizes = [len(b[0]) for b in pump.batches()]
        assert sizes == [8, 2]

    def test_small_ring_backpressure(self):
        import time

        size, history, batch = 128, 32, 2
        new_bytes = 2 * (size - history)
        data = make_stream(new_bytes * 64)
        pump = StreamPump(io.BytesIO(data), size, history, batch,
                          capacity_bytes=1024, chunk_bytes=512,
                          timestamper=lambda: 0.0)
        # Let the producer definitely hit the full ring before draining,
        # so the stall counter is deterministic.
        time.sleep(0.2)
        out = list(pump.batches())
        assert sum(len(b[0]) for b in out) == 64
        assert pump.overflows > 0  # tiny ring must have stalled
        assert "producer stalls" in pump.stats_line()

    def test_empty_stream(self):
        pump = StreamPump(io.BytesIO(b""), 128, 32, 4,
                          timestamper=lambda: 0.0)
        assert list(pump.batches()) == []


class TestReadUnfold:
    """The fused ring->blocks unfold vs the two-step read + unfold."""

    def test_fused_equals_two_step_across_wraps(self):
        from thrifty_tpu import native

        block_bytes, hist = 96, 32
        new = block_bytes - hist
        data = make_stream(new * 37 + 11)  # odd tail, dropped by both
        for cap in (257, 1024, new * 4):  # capacities forcing wraps
            for batch in (1, 3, 5):
                if batch * new > cap:
                    continue
                # two-step oracle
                ref_rows = []
                ring = native.RingBuffer(cap)
                import threading

                def feed(ring=ring):
                    for i in range(0, len(data), 100):
                        ring.write(
                            np.frombuffer(data[i:i+100], np.uint8))
                    ring.close()
                threading.Thread(target=feed, daemon=True).start()
                while True:
                    chunk = ring.read(batch * new)
                    n = len(chunk) // new
                    if n == 0:
                        break
                    rows = native.unfold(chunk[: n * new], block_bytes,
                                         hist, n)
                    ref_rows.append(rows.copy())
                    if len(chunk) < batch * new:
                        break
                ref = np.concatenate(ref_rows)

                got_rows = []
                ring2 = native.RingBuffer(cap)
                threading.Thread(target=feed, args=(ring2,),
                                 daemon=True).start()
                out = np.empty((batch, block_bytes), np.uint8)
                while True:
                    n, got = ring2.read_unfold(out, hist)
                    if n == 0:
                        break
                    rows = out[:n].copy()
                    rows[0, :hist] = 128  # fused leaves row-0 history
                    got_rows.append(rows)
                    if got < batch * new:
                        break
                fused = np.concatenate(got_rows)
                np.testing.assert_array_equal(fused, ref,
                                              err_msg=f"{cap}/{batch}")

    def test_guards(self):
        from thrifty_tpu import native

        ring = native.RingBuffer(64)
        out = np.empty((4, 96), np.uint8)
        with __import__("pytest").raises(ValueError):
            ring.read_unfold(out, 64)   # history > advance
        with __import__("pytest").raises(ValueError):
            ring.read_unfold(out, 32)   # batch exceeds capacity


class TestMmapPath:
    """Regular-file ingest (mmap, one-copy) vs the ring path."""

    def test_file_matches_bytesio(self, tmp_path):
        data = make_stream(11464 * 2 * 23 + 77)  # partial tail dropped
        p = tmp_path / "stream.raw"
        p.write_bytes(data)
        for batch in (1, 8, 256):
            ring_batches = [
                (ts.copy(), idx.copy(), raw.copy())
                for ts, idx, raw in StreamPump(
                    io.BytesIO(data), 16384, 4920, batch,
                    t0=100.0).batches()]
            with open(p, "rb") as f:
                pump = StreamPump(f, 16384, 4920, batch, t0=100.0)
                assert pump._mm is not None, "mmap path not engaged"
                mm_batches = []
                for ts, idx, raw in pump.batches():
                    mm_batches.append((ts.copy(), idx.copy(), raw.copy()))
            assert len(mm_batches) == len(ring_batches)
            for (t1, i1, r1), (t2, i2, r2) in zip(ring_batches,
                                                  mm_batches):
                np.testing.assert_array_equal(t1, t2)
                np.testing.assert_array_equal(i1, i2)
                np.testing.assert_array_equal(r1, r2)

    def test_large_history_small_batch(self, tmp_path):
        # Regression: with history > one batch's advance, later
        # batches' history offset went negative and Python slice
        # semantics wrapped it to the END of the mmap -- silently
        # corrupting block history for file input (review finding).
        data = make_stream(2 * 28 * 37 + 5)
        p = tmp_path / "stream.raw"
        p.write_bytes(data)
        for block, hist, batch in ((128, 100, 2), (128, 100, 1),
                                   (64, 48, 3)):
            ring_batches = [
                (ts.copy(), idx.copy(), raw.copy())
                for ts, idx, raw in StreamPump(
                    io.BytesIO(data), block, hist, batch,
                    t0=5.0).batches()]
            with open(p, "rb") as f:
                pump = StreamPump(f, block, hist, batch, t0=5.0)
                assert pump._mm is not None
                mm_batches = [(ts.copy(), idx.copy(), raw.copy())
                              for ts, idx, raw in pump.batches()]
            assert len(mm_batches) == len(ring_batches)
            for (t1, i1, r1), (t2, i2, r2) in zip(ring_batches,
                                                  mm_batches):
                np.testing.assert_array_equal(t1, t2)
                np.testing.assert_array_equal(i1, i2)
                np.testing.assert_array_equal(r1, r2)

    def test_nonzero_file_start(self, tmp_path):
        # A consumed prefix (stream.tell() > 0) must not leak
        # pre-stream file bytes into any block's history: positions
        # before the start are 128s, exactly as the ring path sees.
        data = make_stream(2 * 28 * 37)
        skip = 123
        p = tmp_path / "stream.raw"
        p.write_bytes(data)
        for block, hist, batch in ((128, 100, 2), (64, 16, 4)):
            bio = io.BytesIO(data)
            bio.read(skip)
            ring_batches = [
                (idx.copy(), raw.copy())
                for _, idx, raw in StreamPump(
                    bio, block, hist, batch, t0=5.0).batches()]
            with open(p, "rb") as f:
                f.read(skip)
                pump = StreamPump(f, block, hist, batch, t0=5.0)
                assert pump._mm is not None
                mm_batches = [(idx.copy(), raw.copy())
                              for _, idx, raw in pump.batches()]
            assert len(mm_batches) == len(ring_batches)
            for (i1, r1), (i2, r2) in zip(ring_batches, mm_batches):
                np.testing.assert_array_equal(i1, i2)
                np.testing.assert_array_equal(r1, r2)

    def test_pipe_still_uses_ring(self):
        import os
        r, w = os.pipe()
        os.write(w, b"\x80" * 1024)
        os.close(w)
        with open(r, "rb") as f:
            pump = StreamPump(f, 64, 16, 4, t0=0.0)
            assert pump._mm is None
            list(pump.batches())

    def test_stats_line_reports_mode(self, tmp_path):
        p = tmp_path / "s.raw"
        p.write_bytes(make_stream(4096))
        with open(p, "rb") as f:
            pump = StreamPump(f, 64, 16, 4, t0=0.0)
            assert "mmap" in pump.stats_line()
            assert pump.overflows == 0
            list(pump.batches())


class TestBatchesContiguous:
    def test_matches_batches_bytes(self, tmp_path):
        # Contiguous yields exactly the NEW bytes of each batch that
        # batches() unfolds into rows -- both ingest paths (mmap+ring).
        data = make_stream(2 * 28 * 11 + 3)
        p = tmp_path / "s.raw"
        p.write_bytes(data)
        for src in (lambda: io.BytesIO(data),
                    lambda: open(p, "rb")):
            rows = [
                (idx.copy(), raw.copy()) for _, idx, raw in
                StreamPump(src(), 64, 16, 3, t0=1.0).batches()]
            flat = [
                (idx.copy(), raw.copy()) for _, idx, raw in
                StreamPump(src(), 64, 16, 3, t0=1.0)
                .batches_contiguous()]
            assert len(rows) == len(flat)
            for (i1, r1), (i2, r2) in zip(rows, flat):
                np.testing.assert_array_equal(i1, i2)
                # new bytes of each row == the contiguous slice
                np.testing.assert_array_equal(
                    r1[:, 2 * 16:].reshape(-1), r2)

    def test_sub_block_stream_yields_nothing(self):
        pump = StreamPump(io.BytesIO(b"\x80" * 10), 64, 16, 3)
        assert list(pump.batches_contiguous()) == []
