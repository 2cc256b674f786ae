"""Property/robustness tests: parsers must never crash on hostile input."""

import io

import numpy as np
import pytest

from thrifty_tpu.config import parsers, settings as settings_mod
from thrifty_tpu.io import card, toad


def random_bytes_lines(rng, n=200):
    out = []
    for _ in range(n):
        length = int(rng.integers(0, 80))
        out.append(bytes(rng.integers(0, 256, length, dtype=np.uint8)))
    return b"\n".join(out)


class TestCardRobustness:
    @pytest.mark.parametrize("seed", range(5))
    def test_random_garbage_never_crashes(self, seed):
        rng = np.random.default_rng(seed)
        blob = random_bytes_lines(rng)
        ts, idx, raw = card.read_card(io.BytesIO(blob), native=False)
        assert len(ts) == len(idx) == len(raw)

    @pytest.mark.parametrize("seed", range(5))
    def test_random_garbage_native(self, seed):
        native = pytest.importorskip("thrifty_tpu.native")
        rng = np.random.default_rng(seed)
        blob = random_bytes_lines(rng)
        try:
            ts, idx, raw = native.parse_card_bytes(blob)
            assert len(ts) == len(idx)
        except ValueError:
            pass  # inconsistent/invalid payloads may be rejected

    def test_mixed_valid_invalid_lines(self):
        import base64
        enc = base64.b64encode(bytes(range(32))).decode()
        blob = ("junk\n# comment\n1.5 0 {e}\nnot a line\n"
                "2.5 1 {e}\n".format(e=enc)).encode()
        ts, idx, raw = card.read_card(io.BytesIO(blob))
        assert idx.tolist() == [0, 1]


class TestToadRobustness:
    @pytest.mark.parametrize("seed", range(3))
    def test_random_text_never_crashes(self, seed):
        rng = np.random.default_rng(seed)
        lines = []
        for _ in range(100):
            n = int(rng.integers(0, 20))
            lines.append(" ".join(
                str(rng.normal()) for _ in range(n)))
        det = toad.load_toads(io.StringIO("\n".join(lines)))
        assert det.dtype == toad.DETECTION_DTYPE

    def test_truncated_line_skipped(self):
        det = toad.load_toad(io.StringIO("0 1.5 3 100.0\n"))
        assert len(det) == 0


class TestParserRobustness:
    @pytest.mark.parametrize("seed", range(3))
    def test_threshold_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        chars = "0123456789.+*csd snrtdev"
        for _ in range(200):
            s = "".join(rng.choice(list(chars),
                                   size=int(rng.integers(1, 15))))
            try:
                c, sn, d = parsers.threshold(s)
                assert np.isfinite([c, sn, d]).all()
            except ValueError:
                pass

    @pytest.mark.parametrize("seed", range(3))
    def test_freq_range_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        chars = "0123456789.-+ kMhzHZ"
        for _ in range(200):
            s = "".join(rng.choice(list(chars),
                                   size=int(rng.integers(1, 15))))
            try:
                start, stop, hz = parsers.freq_range(s)
                assert np.isfinite([start, stop]).all()
            except ValueError:
                pass

    def test_config_fuzz(self):
        rng = np.random.default_rng(0)
        printable = [chr(c) for c in range(32, 127)]
        for _ in range(100):
            text = "".join(rng.choice(printable,
                                      size=int(rng.integers(0, 200))))
            try:
                settings_mod.parse_kv_config(io.StringIO(text))
            except settings_mod.ConfigError:
                pass
