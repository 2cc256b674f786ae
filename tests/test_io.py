import io

import numpy as np
import pytest

from thrifty_tpu.dsp import iq
from thrifty_tpu.io import blocks as blocks_io
from thrifty_tpu.io import card, toad


class TestCard:
    def make_capture(self, b=4, n=64, seed=0):
        rng = np.random.default_rng(seed)
        ts = 1.5e9 + np.arange(b) * 0.1
        idx = np.arange(b, dtype=np.int64) + 7
        raw = rng.integers(0, 256, size=(b, 2 * n), dtype=np.uint8)
        return ts, idx, raw

    def test_round_trip(self):
        ts, idx, raw = self.make_capture()
        buf = io.StringIO()
        card.write_card(buf, ts, idx, raw, header="test capture")
        buf.seek(0)
        ts2, idx2, raw2 = card.read_card(
            io.BytesIO(buf.getvalue().encode()))
        np.testing.assert_allclose(ts2, ts, atol=1e-6)
        np.testing.assert_array_equal(idx2, idx)
        np.testing.assert_array_equal(raw2, raw)

    def test_comments_and_junk_skipped(self):
        ts, idx, raw = self.make_capture(b=1)
        buf = io.StringIO()
        buf.write("# header\n\nUsing Volk machine: foo\nlinux; bar\n")
        card.write_card(buf, ts, idx, raw)
        buf.seek(0)
        ts2, _, _ = card.read_card(io.BytesIO(buf.getvalue().encode()))
        assert len(ts2) == 1

    def test_blocks_reader(self):
        ts, idx, raw = self.make_capture()
        buf = io.StringIO()
        card.write_card(buf, ts, idx, raw)
        _, _, blocks = card.read_card_blocks(
            io.BytesIO(buf.getvalue().encode()))
        np.testing.assert_array_equal(blocks, iq.raw_to_iq(raw))

    def test_batched_iteration(self):
        ts, idx, raw = self.make_capture(b=10)
        buf = io.StringIO()
        card.write_card(buf, ts, idx, raw)
        buf.seek(0)
        batches = list(card.iter_card_batches(
            io.BytesIO(buf.getvalue().encode()), batch_size=4))
        assert [len(b[0]) for b in batches] == [4, 4, 2]
        np.testing.assert_array_equal(
            np.concatenate([b[2] for b in batches]), raw)

    def test_empty(self):
        ts, idx, raw = card.read_card(io.BytesIO(b"# nothing\n"))
        assert len(ts) == 0

    def test_junk_payload_row_skipped(self):
        import base64
        enc = base64.b64encode(bytes(range(16))).decode()
        blob = ("1.5 0 {e}\n2.0 1 restarting\n2.5 2 {e}\n"
                .format(e=enc)).encode()
        for native in (True, False):
            ts, idx, raw = card.read_card(io.BytesIO(blob), native=native)
            assert idx.tolist() == [0, 2], "native={}".format(native)
        # The streaming batch path must also survive the junk row.
        batches = list(card.iter_card_batches(io.BytesIO(blob), 2))
        got = np.concatenate([b[1] for b in batches])
        assert got.tolist() == [0, 2]

    def test_junk_head_row_does_not_poison_batch(self):
        # A junk line that PARSES as '<float> <int> <valid-b64>' but
        # with the wrong block size must be dropped alone -- it must
        # not set the probed block size and silently drop every real
        # row behind it (modal-length guard), in both the native
        # tolerant batch decoder and the Python fallback.
        import base64
        enc = base64.b64encode(bytes(range(32))).decode()
        blob = ("1.0 0 foob\n1.5 1 {e}\n2.0 2 {e}\n2.5 3 {e}\n"
                .format(e=enc)).encode()
        batches = list(card.iter_card_batches(io.BytesIO(blob), 4))
        got = np.concatenate([b[1] for b in batches])
        assert got.tolist() == [1, 2, 3]
        assert batches[0][2].shape[1] == 32

    def test_non_ascii_junk_row_skipped(self):
        # Binary garbage on a junk line (U+FFFD after the text read)
        # must be dropped, not crash the ascii re-encode in the native
        # tolerant batch decoder.
        import base64
        enc = base64.b64encode(bytes(range(32))).decode()
        blob = ("1.0 0 {e}\n2.0 1 \xff\xfejunk\n3.0 2 {e}\n"
                .format(e=enc)).encode("utf-8")
        batches = list(card.iter_card_batches(io.BytesIO(blob), 3))
        got = np.concatenate([b[1] for b in batches])
        assert got.tolist() == [0, 2]

    def test_mixed_size_capture_fails_loudly(self):
        # A genuinely mixed-size capture (many rows of two sizes) is
        # an error, not a silent majority vote -- same contract as the
        # whole-file native parse.
        import base64
        a = base64.b64encode(bytes(range(32))).decode()
        b = base64.b64encode(bytes(range(16))).decode()
        rows = ["{}.0 {} {}".format(i, i, a if i % 2 else b)
                for i in range(40)]
        blob = ("\n".join(rows) + "\n").encode()
        with pytest.raises(ValueError, match="inconsistent block sizes"):
            list(card.iter_card_batches(io.BytesIO(blob), 40))

    def test_raw_batches_zero_history(self):
        # history=0: `[-0:]` would carry the WHOLE block as the next
        # tail (ever-growing blocks -> np.stack crash).
        samples = np.arange(1, 41, dtype=np.uint8)
        batches = list(blocks_io.raw_batches(
            io.BytesIO(samples.tobytes()), 4, 0, batch_size=3,
            timestamper=lambda: 0.0))
        raw = np.concatenate([b[2] for b in batches])
        assert raw.shape == (5, 8)
        np.testing.assert_array_equal(raw.reshape(-1), samples)


class TestToad:
    def make_detections(self, n=3):
        det = toad.empty(n)
        det["rxid"] = [0, 1, 2][:n]
        det["txid"] = [5, 6, 7][:n]
        det["timestamp"] = 1.5e9 + np.arange(n)
        det["block"] = np.arange(n) * 100
        det["soa"] = np.arange(n) * 11464.0 + 0.12345678
        det["sample"] = [10, 20, 30][:n]
        det["offset"] = [0.1, -0.2, 0.3][:n]
        det["energy"] = [100.0, 200.0, 300.0][:n]
        det["noise"] = [1.0, 2.0, 3.0][:n]
        det["carrier_bin"] = [40, 41, 42][:n]
        det["carrier_offset"] = [0.25, -0.25, 0.0][:n]
        det["carrier_energy"] = [50.0, 60.0, 70.0][:n]
        det["carrier_noise"] = [0.5, 0.6, 0.7][:n]
        return det

    def test_toad_round_trip(self):
        det = self.make_detections()
        buf = io.StringIO()
        toad.save(buf, det, with_rxid=True, with_txid=False)
        buf.seek(0)
        back = toad.load_toad(buf)
        for field in det.dtype.names:
            if field == "txid":
                continue  # not serialized in .toad
            np.testing.assert_allclose(
                back[field].astype(float), det[field].astype(float),
                atol=1e-6, err_msg=field)

    def test_toads_round_trip_with_txid(self):
        det = self.make_detections()
        buf = io.StringIO()
        toad.save(buf, det, with_rxid=True, with_txid=True)
        buf.seek(0)
        back = toad.load_toads(buf)
        np.testing.assert_array_equal(back["txid"], det["txid"])
        np.testing.assert_array_equal(back["rxid"], det["rxid"])

    def test_field_order_matches_reference_format(self):
        # rxid ts block soa sample offset energy noise cbin coff cen cnoise
        det = self.make_detections(1)
        line = toad.format_line(det[0], with_rxid=True)
        parts = line.split()
        assert len(parts) == 12
        assert parts[0] == "0"
        assert float(parts[1]) == det[0]["timestamp"]
        assert int(parts[2]) == det[0]["block"]
        assert float(parts[3]) == pytest.approx(det[0]["soa"])
        assert int(parts[4]) == 10
        assert int(parts[8]) == 40

    def test_from_detector_output(self):
        out = {
            "detected": np.array([True, False, True]),
            "corr_sample": np.array([5, 6, 7]),
            "corr_offset": np.array([0.1, 0.2, 0.3], np.float32),
            "corr_energy": np.array([10.0, 11.0, 12.0], np.float32),
            "corr_noise": np.array([1.0, 1.1, 1.2], np.float32),
            "carrier_bin": np.array([40, 41, 42]),
            "carrier_offset": np.array([0.0, 0.1, 0.2], np.float32),
            "carrier_energy": np.array([9.0, 9.1, 9.2], np.float32),
            "carrier_noise": np.array([0.9, 0.8, 0.7], np.float32),
        }
        ts = np.array([1.0, 2.0, 3.0])
        idx = np.array([0, 1, 2])
        soa = np.array([100.0, 200.0, 300.0])
        det = toad.from_detector_output(ts, idx, soa, out, rxid=9)
        assert len(det) == 2
        assert det["rxid"].tolist() == [9, 9]
        assert det["block"].tolist() == [0, 2]
        assert det["soa"].tolist() == [100.0, 300.0]


class TestRawBlocks:
    def test_overlap_save(self):
        size, history, new = 8, 3, 5
        samples = np.arange(1, 21, dtype=np.uint8)  # 10 complex samples
        stream = io.BytesIO(samples.tobytes())
        batches = list(blocks_io.raw_batches(
            stream, size, history, batch_size=10,
            timestamper=lambda: 0.0))
        assert len(batches) == 1
        _, idx, raw = batches[0]
        assert idx.tolist() == [0, 1]
        # First block: zero-signal prefix (128s) + 10 bytes of new data.
        assert raw[0, :2 * history].tolist() == [128] * (2 * history)
        np.testing.assert_array_equal(raw[0, 2 * history:], samples[:2 * new])
        # Second block overlaps the last `history` samples of the first.
        np.testing.assert_array_equal(
            raw[1, :2 * history], raw[0, -2 * history:])


class TestShortReadSources:
    def test_raw_batches_socketlike_short_reads(self):
        """Socket-backed sources (rtl_tcp) return short reads
        mid-stream; raw_batches must read-fully per block and only
        treat an EMPTY read as EOF (a short read used to end a live
        capture after the first network packet)."""
        samples = np.arange(256, dtype=np.uint8)

        class Trickle:
            """Returns at most 7 bytes per read()."""

            def __init__(self, data):
                self._b = io.BytesIO(data)

            def read(self, n):
                return self._b.read(min(n, 7))

        got = list(blocks_io.raw_batches(
            Trickle(samples.tobytes()), 8, 2, batch_size=4,
            timestamper=lambda: 0.0))
        ref = list(blocks_io.raw_batches(
            io.BytesIO(samples.tobytes()), 8, 2, batch_size=4,
            timestamper=lambda: 0.0))
        assert len(got) == len(ref)
        for (_, gi, gr), (_, ri, rr) in zip(got, ref):
            np.testing.assert_array_equal(gi, ri)
            np.testing.assert_array_equal(gr, rr)


class TestReadCardFallbackParity:
    def test_wrong_size_junk_row_tolerated_without_native(self):
        """One stray wrong-size valid-base64 row must parse identically
        with and without the native lib (the python fallback used to
        raise ValueError on ANY mixed size)."""
        import base64

        enc = base64.b64encode(bytes(range(64))).decode()
        junk = base64.b64encode(b"word").decode()
        blob = ("1.0 0 {e}\n1.5 1 {j}\n2.0 2 {e}\n3.0 3 {e}\n"
                .format(e=enc, j=junk)).encode()
        ts, idx, raw = card.read_card(io.BytesIO(blob), native=False)
        assert idx.tolist() == [0, 2, 3]
        assert raw.shape == (3, 64)
        try:
            from thrifty_tpu.native import parse_card_bytes  # noqa: F401
        except ImportError:
            return
        ts_n, idx_n, raw_n = card.read_card(io.BytesIO(blob), native=True)
        np.testing.assert_array_equal(idx, idx_n)
        np.testing.assert_array_equal(raw, raw_n)

    def test_mostly_junk_still_fails_loudly(self):
        import base64

        a = base64.b64encode(bytes(range(32))).decode()
        b = base64.b64encode(bytes(range(16))).decode()
        rows = ["{}.0 {} {}".format(i, i, a if i % 2 else b)
                for i in range(40)]
        blob = ("\n".join(rows) + "\n").encode()
        with pytest.raises(ValueError, match="inconsistent block sizes"):
            card.read_card(io.BytesIO(blob), native=False)


def test_raw_batches_rejects_degenerate_history():
    """size == history would loop forever (read(0) never looks like
    EOF); history > size reads a negative count.  Both fail loudly."""
    import io as io_mod

    import pytest

    from thrifty_tpu.io import blocks as blocks_io

    stream = io_mod.BytesIO(b"\x80" * 64)
    with pytest.raises(ValueError, match="history"):
        list(blocks_io.raw_batches(stream, 16, 16, 2))
    with pytest.raises(ValueError, match="history"):
        list(blocks_io.raw_batches(stream, 16, 20, 2))
