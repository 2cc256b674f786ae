import pytest

from thrifty_tpu.config import parsers


class TestMetricFloat:
    @pytest.mark.parametrize("string,expected", [
        ("123.4", 123.4),
        ("2.4M", 2.4e6),
        ("0.999707M", 0.999707e6),
        ("433.83M", 433.83e6),
        ("3.4m", 0.0034),
        ("10k", 10e3),
        ("-5u", -5e-6),
        (" 7 ", 7.0),
    ])
    def test_valid(self, string, expected):
        assert parsers.metric_float(string) == pytest.approx(expected)

    @pytest.mark.parametrize("string", ["", "abc", "1.2X3"])
    def test_invalid(self, string):
        with pytest.raises(ValueError):
            parsers.metric_float(string)


class TestFreqRange:
    @pytest.mark.parametrize("string,expected", [
        ("7 - 110", (7.0, 110.0, False)),
        ("7-110", (7.0, 110.0, False)),
        ("0--1", (0.0, -1.0, False)),
        ("100-200 hz", (100.0, 200.0, True)),
        ("2 - 3 MHz", (2e6, 3e6, True)),
        ("10-20 kHz", (10e3, 20e3, True)),
        ("42", (42.0, 42.0, False)),
        ("1.5 kHz", (1500.0, 1500.0, True)),
    ])
    def test_valid(self, string, expected):
        start, stop, is_hz = parsers.freq_range(string)
        assert (start, stop, is_hz) == (
            pytest.approx(expected[0]), pytest.approx(expected[1]),
            expected[2])

    @pytest.mark.parametrize("string", ["", "x-y", "1-2-3"])
    def test_invalid(self, string):
        with pytest.raises(ValueError):
            parsers.freq_range(string)


class TestNormalizeFreqRange:
    def test_bins_pass_through(self):
        assert parsers.normalize_freq_range((7.0, 110.0, False), 100.0) == \
            (7, 110)

    def test_hz_converted(self):
        # bin width 146.484 Hz (2.4 Msps / 16384)
        bin_freq = 2.4e6 / 16384
        start, stop = parsers.normalize_freq_range(
            (1025.0, 16113.0, True), bin_freq)
        assert (start, stop) == (6, 109)  # int() truncates


class TestThreshold:
    @pytest.mark.parametrize("string,expected", [
        ("15*snr", (0.0, 15.0, 0.0)),
        ("15 * snr", (0.0, 15.0, 0.0)),
        ("5 + 3*snr + stddev", (5.0, 3.0, 1.0)),
        ("10c+5s+2d", (10.0, 5.0, 2.0)),
        ("100", (100.0, 0.0, 0.0)),
        ("snr", (0.0, 1.0, 0.0)),
        ("2*constant + 4*stddev", (2.0, 0.0, 4.0)),
    ])
    def test_valid(self, string, expected):
        assert parsers.threshold(string) == pytest.approx(expected)

    @pytest.mark.parametrize("string", ["", "15*bogus", "+"])
    def test_invalid(self, string):
        with pytest.raises(ValueError):
            parsers.threshold(string)
