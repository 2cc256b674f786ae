"""Frequency-shift property tests (reference tests/test_carrier_sync.py
pattern) and fft_bin cross-validation (reference tests/test_util.py)."""

import numpy as np
import pytest

from thrifty_tpu.dsp import shift, util


class TestFractionalShift:
    @pytest.mark.parametrize("bin_f,delta", [
        (40.0, -3.0), (40.0, 2.5), (100.25, -0.25), (7.5, 10.75),
    ])
    def test_shift_moves_tone(self, bin_f, delta):
        """|FFT(shifted x)| must equal |FFT| of a tone at bin_f+delta."""
        n = 2048
        t = np.arange(n)
        x = np.exp(2j * np.pi * bin_f * t / n).astype(np.complex128)
        want = np.abs(np.fft.fft(
            np.exp(2j * np.pi * (bin_f + delta) * t / n)))
        got = np.abs(np.asarray(shift.fractional_shift_fft(
            x[None, :], np.array([delta]))))[0]
        np.testing.assert_allclose(got, want, atol=1e-6 * n)

    def test_zero_shift_identity(self):
        rng = np.random.default_rng(0)
        x = (rng.normal(size=(2, 512))
             + 1j * rng.normal(size=(2, 512))).astype(np.complex128)
        got = np.asarray(shift.fractional_shift_fft(
            x, np.zeros(2)))
        # shift=0 ramp is exp(0)=1: exact FFT.
        np.testing.assert_allclose(got, np.fft.fft(x, axis=-1),
                                   atol=1e-9)


class TestIntegerRoll:
    def test_matches_np_roll(self):
        rng = np.random.default_rng(1)
        f = rng.normal(size=(3, 64)) + 1j * rng.normal(size=(3, 64))
        shifts = np.array([5, -7, 0])
        got = np.asarray(shift.integer_roll_fft(f, shifts))
        for i, s in enumerate(shifts):
            np.testing.assert_allclose(got[i], np.roll(f[i], s),
                                       atol=1e-12)


class TestFftBin:
    def test_matches_fftfreq(self):
        """Signed-bin conversion agrees with np.fft.fftfreq
        (the reference's own oracle, tests/test_util.py:11-16)."""
        for n in (16, 17, 1024):
            freqs = np.fft.fftfreq(n) * n
            for idx in range(n):
                assert util.fft_bin(idx, n) == int(round(freqs[idx])), \
                    (idx, n)
