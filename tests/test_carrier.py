import numpy as np
import pytest

from thrifty_tpu.dsp import carrier


def synth_tone(n, bin_f, ampl=1.0, length=None, noise=0.0, seed=0):
    """Complex tone at (fractional) bin bin_f over `length` samples.

    The tone spans only part of the block: the reference noise formula
    subtracts *twice* the peak power (assuming an OOK signal whose carrier
    line holds about half the energy), so a full-length pure tone would
    drive the noise estimate negative -- by design, such blocks are
    rejected (NaN threshold).
    """
    if length is None:
        length = n // 4
    rng = np.random.default_rng(seed)
    x = np.zeros(n, dtype=np.complex128)
    t = np.arange(length)
    x[:length] = ampl * np.exp(2j * np.pi * bin_f * t / n)
    x += noise * (rng.normal(size=n) + 1j * rng.normal(size=n))
    return x


class TestWindowIndices:
    @pytest.mark.parametrize("start,stop,length,expected", [
        (50, 100, 1024, list(range(50, 101))),
        (0, -1, 1024, list(range(0, 1024))),
        (-10, 10, 1024, list(range(1014, 1024)) + list(range(0, 11))),
        (-1, 0, 1024, [1023, 0]),
        (-20, -10, 1024, list(range(1004, 1015))),
    ])
    def test_ranges(self, start, stop, length, expected):
        idx = carrier.fft_window_indices(start, stop, length)
        assert sorted(idx.tolist()) == sorted(expected)

    def test_out_of_range(self):
        with pytest.raises(ValueError):
            carrier.fft_window_indices(0, 1024, 1024)

    def test_mask(self):
        mask = carrier.window_mask((7, 110), 1024)
        assert mask.sum() == 104
        assert mask[7] and mask[110] and not mask[6] and not mask[111]
        full = carrier.window_mask(None, 64)
        assert full.all()


class TestDetect:
    @pytest.mark.parametrize("bin_f", [20, 100, 511, -20 % 1024])
    def test_peak_found(self, bin_f):
        n = 1024
        x = synth_tone(n, bin_f, ampl=1.0, noise=0.01)
        mag = np.abs(np.fft.fft(x))[None, :]
        mask = carrier.window_mask(None, n)
        det, idx, peak, noise = carrier.detect(mag, mask, (0.0, 15.0, 0.0))
        assert bool(det[0])
        assert int(idx[0]) == bin_f
        assert float(peak[0]) == pytest.approx(n // 4, rel=1e-2)

    def test_windowed_excludes_peak(self):
        n = 1024
        x = synth_tone(n, 200, ampl=1.0, noise=0.01)
        mag = np.abs(np.fft.fft(x))[None, :]
        mask = carrier.window_mask((7, 110), n)
        det, idx, peak, noise = carrier.detect(mag, mask, (0.0, 15.0, 0.0))
        assert 7 <= int(idx[0]) <= 110
        assert not bool(det[0])

    def test_negative_window_wrap(self):
        n = 1024
        x = synth_tone(n, n - 5, ampl=1.0, noise=0.01)  # bin -5
        mag = np.abs(np.fft.fft(x))[None, :]
        mask = carrier.window_mask((-10, 10), n)
        det, idx, _, _ = carrier.detect(mag, mask, (0.0, 15.0, 0.0))
        assert bool(det[0])
        assert int(idx[0]) == n - 5

    def test_noise_formula(self):
        n = 256
        rng = np.random.default_rng(3)
        mag = np.abs(rng.normal(size=(1, n)))
        mask = carrier.window_mask(None, n)
        _, _, peak, noise = carrier.detect(mag, mask, (0.0, 15.0, 0.0))
        expected = np.sqrt(
            (np.sum(mag[0] ** 2) - 2 * np.max(mag[0]) ** 2) / (n - 1))
        assert float(noise[0]) == pytest.approx(expected, rel=1e-5)

    def test_threshold_with_stddev_term(self):
        n = 256
        x = synth_tone(n, 30, ampl=0.05, noise=0.02)
        mag = np.abs(np.fft.fft(x))[None, :]
        mask = carrier.window_mask(None, n)
        # Impossibly high stddev coefficient suppresses detection.
        det, _, _, _ = carrier.detect(mag, mask, (0.0, 0.0, 1e9))
        assert not bool(det[0])

    def test_peak_filter_matches_scipy_lfilter(self):
        # Cross-validate against the reference formulation:
        # filtered = sqrt(lfilter(w[::-1]**2, 1, mag**2))
        # (thrifty/carrier_detect.py:128-135).
        import scipy.signal
        rng = np.random.default_rng(5)
        mag = np.abs(rng.normal(size=(3, 128))).astype(np.float64)
        weights = np.array([0.2, 0.8, 0.5, 0.1])
        weights = weights / np.sqrt(np.sum(weights**2))
        got, delay = carrier.apply_peak_filter(mag, weights)
        expected = np.sqrt(scipy.signal.lfilter(
            weights[::-1] ** 2, 1, mag**2, axis=-1))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)
        assert delay == len(weights) - np.argmax(weights) - 1

    def test_peak_filter_improves_detection(self):
        # A Dirichlet-shaped carrier peak in noise: the matched filter
        # must place the peak at the same index as unfiltered argmax
        # and estimate at least as much peak energy.
        from thrifty_tpu.dsp import dirichlet
        n, w = 1024, 300
        x = synth_tone(n, 100, ampl=1.0, length=w, noise=0.05)
        mag = np.abs(np.fft.fft(x))[None, :]
        weights = dirichlet.dirichlet_weights(7, n, w)
        mask = carrier.window_mask((50, 200), n)
        det0, idx0, mag0, _ = carrier.detect(mag, mask, (0.0, 15.0, 0.0))
        det1, idx1, mag1, _ = carrier.detect(
            mag, mask, (0.0, 15.0, 0.0), peak_filter=weights)
        assert bool(det1[0])
        assert abs(int(idx1[0]) - int(idx0[0])) <= 1
        # The energy-domain FIR redistributes the peak energy across the
        # kernel; the estimate stays the same order as the raw peak.
        assert float(mag1[0]) >= 0.7 * float(mag0[0])

    def test_peak_filter_reference_semantics_on_wrapped_window(self):
        # The reference filters the CONTIGUOUS wrapped window selection
        # -- zero initial conditions at the window START, argmax over
        # every filter output, peak index up to `delay` bins below the
        # window (thrifty/carrier_detect.py:123-154).  Reproduce its
        # exact float64 computation on a window crossing the
        # negative-bin wrap; a whole-spectrum FIR with the mask rolled
        # (the old formulation) mis-bins carriers near the wrap.
        import scipy.signal

        from thrifty_tpu.dsp import dirichlet
        n, w = 1024, 300
        weights = np.asarray(dirichlet.dirichlet_weights(5, n, w),
                             dtype=np.float64)
        sel = carrier.fft_window_indices(-10, 10, n)
        mask = carrier.window_mask((-10, 10), n)
        delay = len(weights) - int(np.argmax(weights)) - 1
        for bin_f in (-3, -2, 2, 3, -9, 10):
            x = synth_tone(n, bin_f, ampl=1.0, length=w, noise=0.05,
                           seed=abs(bin_f))
            mag = np.abs(np.fft.fft(x))
            _, idx, pmag, _ = carrier.detect(
                mag[None], mask, (0.0, 5.0, 0.0), peak_filter=weights)
            filtered = np.sqrt(scipy.signal.lfilter(
                weights[::-1] ** 2, 1, mag[sel] ** 2))
            k = int(np.argmax(filtered))
            assert int(idx[0]) == (k - delay + sel[0]) % n, bin_f
            np.testing.assert_allclose(float(pmag[0]), filtered[k],
                                       rtol=1e-5)

    def test_peak_filter_symmetric_across_wrap(self):
        # Identical carrier shapes at bins -b and +b inside a symmetric
        # window must produce mirrored peak indices and (near-)equal
        # filtered magnitudes -- the regression the old zero-padded
        # whole-spectrum FIR failed.
        from thrifty_tpu.dsp import dirichlet
        n, w = 1024, 300
        weights = dirichlet.dirichlet_weights(5, n, w)
        mask = carrier.window_mask((-10, 10), n)
        for b in (2, 3, 5):
            mags = []
            idxs = []
            for bin_f in (b, -b):
                x = synth_tone(n, bin_f, ampl=1.0, length=w, noise=0.0)
                mag = np.abs(np.fft.fft(x))
                _, idx, pmag, _ = carrier.detect(
                    mag[None], mask, (0.0, 0.0, 0.0),
                    peak_filter=weights)
                mags.append(float(pmag[0]))
                idxs.append(int(idx[0]))
            assert idxs[0] == b and idxs[1] == n - b
            np.testing.assert_allclose(mags[0], mags[1], rtol=1e-5)

    def test_batched(self):
        n = 512
        blocks = np.stack([
            synth_tone(n, 10, 1.0, noise=0.01),
            synth_tone(n, 20, 1.0, noise=0.01),
            synth_tone(n, 30, 0.0, noise=1.0, seed=7),  # pure noise
        ])
        mag = np.abs(np.fft.fft(blocks, axis=-1))
        mask = carrier.window_mask(None, n)
        det, idx, _, _ = carrier.detect(mag, mask, (0.0, 15.0, 0.0))
        assert det.tolist() == [True, True, False]
        assert idx.tolist()[:2] == [10, 20]


class TestUltraStrongCarrier:
    def test_detected_not_nan_rejected(self):
        """A carrier holding more than half the block energy makes the
        noise variance negative.  The reference Python's sqrt-first
        formula turns that into a NaN threshold and silently rejects
        the strongest blocks; we follow fastcard/cardet.c:22-27 (signed
        power in the threshold) and detect them."""
        import jax.numpy as jnp

        n = 1024
        x = synth_tone(n, 40, ampl=100.0, length=n)  # full-length tone
        mag = np.abs(np.fft.fft(x)).astype(np.float32)
        assert np.sum(mag**2) < 2 * np.max(mag) ** 2  # negative regime
        mask = carrier.window_mask((7, 110), n)
        det, idx, peak, noise = carrier.detect(
            jnp.asarray(mag)[None, :], mask, (0.0, 15.0, 0.0))
        assert bool(np.asarray(det)[0])
        assert int(np.asarray(idx)[0]) == 40
        assert float(np.asarray(noise)[0]) == 0.0  # clamped, not NaN

    def test_normal_regime_bit_identical(self):
        """The signed-variance fix must not change results at any
        physical noise level (variance >= 0): same decision, same
        noise, same peak as the original formula computed by hand."""
        import jax.numpy as jnp

        n = 1024
        x = synth_tone(n, 60, ampl=1.0, length=n // 4, noise=0.05)
        mag = np.abs(np.fft.fft(x)).astype(np.float32)
        mask = carrier.window_mask((7, 110), n)
        det, idx, peak, noise = carrier.detect(
            jnp.asarray(mag)[None, :], mask, (0.0, 15.0, 0.0))
        peak_ref = np.float32(mag[np.asarray(idx)[0]])
        var = np.float32(
            (np.float32(np.sum(np.square(mag))) - 2 * peak_ref**2)
            / np.float32(n - 1))
        assert var > 0
        assert float(np.asarray(noise)[0]) == pytest.approx(
            float(np.sqrt(var)), rel=1e-6)


class TestWrappedFullSpanWindowFilter:
    def test_filtered_peak_matches_oracle(self):
        """A wrapped FULL-coverage window (e.g. (-N/2, N/2-1)) has an
        all-True mask that cannot encode its start bin; the FIR's
        start-up transient must sit at the window START (index N/2,
        like the oracle/reference), not at index 0.  detect() gets the
        explicit selection for this."""
        import jax.numpy as jnp

        from thrifty_tpu.dsp import dirichlet
        from thrifty_tpu.oracle.numpy_ref import OracleDetector

        n, tlen = 1024, 200
        window = (-(n // 2), n // 2 - 1)
        weights = dirichlet.dirichlet_weights(7, n, tlen)
        rng = np.random.default_rng(4)
        oracle = OracleDetector(
            np.ones(tlen), block_len=n, history_len=tlen - 1,
            carrier_thresh=(0.0, 1.0, 0.0), carrier_window=window,
            peak_filter=weights)
        sel = carrier.fft_window_indices(window[0], window[1], n)
        mask = carrier.window_mask(window, n)
        assert mask.all()  # the ambiguous case

        # Tones near the selection start (the transient region) and a
        # noise-only block.
        for bin_f in (n // 2 + 1, n // 2 + 3, 40, None):
            x = 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
            if bin_f is not None:
                t = np.arange(n // 3)
                x[: n // 3] += np.exp(2j * np.pi * bin_f * t / n)
            mag = np.abs(np.fft.fft(x))
            o_det, o_idx, o_mag, _ = oracle.carrier_detect(mag)
            det, idx, pmag, _ = carrier.detect(
                jnp.asarray(mag.astype(np.float32))[None, :], mask,
                (0.0, 1.0, 0.0), peak_filter=weights, selection=sel)
            assert int(np.asarray(idx)[0]) % n == o_idx % n, bin_f
            assert bool(np.asarray(det)[0]) == bool(o_det), bin_f
            assert float(np.asarray(pmag)[0]) == pytest.approx(
                float(o_mag), rel=1e-5)
