import numpy as np
import pytest
import scipy.signal

from thrifty_tpu.dsp import xcorr


class TestCorrWindow:
    def test_reference_geometry(self):
        # block 16384 / history 4920 / template 4914:
        # corr_len = 11471, padding = 7, window = [3, 11467).
        start, stop = xcorr.corr_window(16384, 4920, 4914)
        assert (start, stop) == (3, 11467)

    def test_minimal_history(self):
        start, stop = xcorr.corr_window(64, 15, 16)
        assert (start, stop) == (0, 49)

    def test_history_too_small(self):
        with pytest.raises(AssertionError):
            xcorr.corr_window(64, 10, 16)


class TestDespread:
    def test_matches_scipy_correlate(self):
        # The reference's own oracle pattern
        # (tests/test_soa_estimator.py:65-75): frequency-domain despread
        # must equal scipy.signal.correlate(..., mode='valid').
        rng = np.random.default_rng(0)
        n, tlen = 256, 31
        tmpl = np.where(rng.random(tlen) > 0.5, 1.0, -1.0)
        x = rng.normal(size=n) + 1j * rng.normal(size=n)
        corr_len = n - tlen + 1

        tconj = np.conj(np.fft.fft(np.pad(tmpl, (0, n - tlen))))
        got = np.asarray(xcorr.despread(
            np.fft.fft(x)[None, :].astype(np.complex128),
            tconj, corr_len))[0]
        expected = scipy.signal.correlate(x, tmpl, mode="valid")
        np.testing.assert_allclose(got, expected, atol=1e-9)

    def test_bank_broadcast(self):
        rng = np.random.default_rng(1)
        n, tlen, t = 128, 16, 3
        bank = np.where(rng.random((t, tlen)) > 0.5, 1.0, -1.0)
        x = rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
        corr_len = n - tlen + 1
        tconj = np.conj(np.fft.fft(np.pad(bank, ((0, 0), (0, n - tlen)))))
        got = np.asarray(xcorr.despread(np.fft.fft(x, axis=-1), tconj,
                                        corr_len))
        assert got.shape == (2, t, corr_len)
        for b in range(2):
            for k in range(t):
                expected = scipy.signal.correlate(x[b], bank[k], mode="valid")
                np.testing.assert_allclose(got[b, k], expected, atol=1e-9)


class TestWindowPeak:
    def test_peak_inside_window(self):
        mag = np.zeros((1, 100))
        mag[0, 50] = 5.0
        idx, peak = xcorr.window_peak(mag, (10, 90))
        assert int(idx[0]) == 50 and float(peak[0]) == 5.0

    def test_peak_outside_window_ignored(self):
        mag = np.zeros((1, 100))
        mag[0, 5] = 9.0   # outside
        mag[0, 60] = 2.0  # inside
        idx, peak = xcorr.window_peak(mag, (10, 90))
        assert int(idx[0]) == 60 and float(peak[0]) == 2.0

    def test_window_edges(self):
        mag = np.zeros((2, 100))
        mag[0, 10] = 1.0   # at start: included
        mag[1, 90] = 1.0   # at stop: excluded
        mag[1, 89] = 0.5
        idx, _ = xcorr.window_peak(mag, (10, 90))
        assert idx.tolist() == [10, 89]


class TestNoiseThreshold:
    def test_noise_formula(self):
        # noise = sqrt((E_sig*E_tmpl - peak^2)/N)
        got = np.asarray(xcorr.noise_rms(
            np.array([10.0]), np.array([50.0]), 8.0, 100))
        assert float(got[0]) == pytest.approx(np.sqrt((400 - 100) / 100))

    def test_noise_clamped_nonnegative(self):
        got = np.asarray(xcorr.noise_rms(
            np.array([100.0]), np.array([1.0]), 1.0, 10))
        assert float(got[0]) == 0.0

    def test_threshold(self):
        mag = np.ones((1, 64))
        t = np.asarray(xcorr.threshold(mag, np.array([2.0]), (3.0, 4.0, 0.0)))
        assert float(t[0]) == pytest.approx(np.sqrt(3 + 4 * 4))


class TestInterpolation:
    def test_gaussian_recovers_offset(self):
        # A sampled Gaussian peak is exactly recovered by log-parabolic fit.
        x = np.arange(64, dtype=np.float64)
        true_pos = 30.37
        y = np.exp(-((x - true_pos) ** 2) / 7.0)[None, :]
        off = np.asarray(xcorr.gaussian_interpolate(y, np.array([30])))
        assert float(off[0]) == pytest.approx(0.37, abs=1e-9)

    def test_clipping(self):
        y = np.ones((1, 16))
        y[0, 8] = 1.0001
        y[0, 9] = 1.00009999  # nearly flat -> huge raw offset
        off = np.asarray(xcorr.gaussian_interpolate(y, np.array([8])))
        assert abs(float(off[0])) <= 0.6

    def test_boundary_peak_returns_zero(self):
        y = np.random.default_rng(0).random((2, 16))
        off = np.asarray(xcorr.gaussian_interpolate(
            y, np.array([0, 15])))
        assert off.tolist() == [0.0, 0.0]

    def test_parabolic_recovers_offset(self):
        x = np.arange(64, dtype=np.float64)
        y = (100 - (x - 20.25) ** 2)[None, :]
        off = np.asarray(xcorr.parabolic_interpolate(y, np.array([20])))
        assert float(off[0]) == pytest.approx(0.25, abs=1e-9)

    def test_cosine_recovers_offset(self):
        # Exact on a sampled cosine with the peak at 30.35.
        x = np.arange(64, dtype=np.float64)
        w = 0.4
        y = np.cos(w * (x - 30.35))[None, :]
        off = np.asarray(xcorr.cosine_interpolate(y, np.array([30])))
        assert float(off[0]) == pytest.approx(0.35, abs=1e-9)

    def test_autocorr_fit_recovers_offset(self):
        # Build a true fractional-delay correlation peak from the sim's
        # band-limited burst machinery and recover the offset.
        from thrifty_tpu import sim
        from thrifty_tpu.dsp import template as template_mod

        tpl = template_mod.generate(7, 0, 2.4)  # 304 samples
        n = 2048
        for true_frac in [-0.33, 0.0, 0.41]:
            stream = sim.synth_stream(
                n, [{"position": 700 + true_frac, "carrier_bin": 0.0,
                     "amplitude": 1.0, "phase": 0.0}],
                tpl, n, noise_std=0.0, seed=0)
            corr = np.abs(np.fft.ifft(
                np.fft.fft(stream)
                * np.conj(np.fft.fft(np.pad(tpl, (0, n - len(tpl)))))
            ))[: n - len(tpl) + 1]
            interp = xcorr.make_autocorr_interpolator(tpl)
            pk = int(np.argmax(corr))
            off = float(np.asarray(interp(
                corr[None, :].astype(np.float32), np.array([pk])))[0])
            est = pk + off
            assert est == pytest.approx(700 + true_frac, abs=0.03)

    def test_cosine_invalid_fit_returns_zero(self):
        y = np.ones((1, 16))
        y[0, 8] = 0.9  # a+c > 2b: arccos argument > 1
        off = np.asarray(xcorr.cosine_interpolate(y, np.array([8])))
        assert float(off[0]) == 0.0
