import numpy as np
import pytest

from thrifty_tpu.dsp import dirichlet


BLOCK = 1024
CARRIER = 300


def tone_mag(bin_f, n=BLOCK, length=CARRIER):
    """|FFT| of a finite tone at fractional bin bin_f."""
    t = np.arange(length)
    x = np.zeros(n, dtype=np.complex128)
    x[:length] = np.exp(2j * np.pi * bin_f * t / n)
    return np.abs(np.fft.fft(x))


class TestKernel:
    def test_unit_at_zero(self):
        assert dirichlet.dirichlet_kernel(
            np.array([0.0]), BLOCK, CARRIER)[0] == pytest.approx(1.0)

    def test_matches_definition(self):
        x = np.array([0.5, 1.0, 2.5, -3.0])
        got = dirichlet.dirichlet_kernel(x, BLOCK, CARRIER)
        expected = (np.sin(np.pi * CARRIER * x / BLOCK)
                    / np.sin(np.pi * x / BLOCK) / CARRIER)
        np.testing.assert_allclose(got, expected, rtol=1e-9)

    def test_taylor_branch_continuous(self):
        # Values just inside/outside the Taylor switchover must agree.
        for x in [0.009, 0.011, -0.009, -0.011]:
            got = dirichlet.dirichlet_kernel(np.array([x]), BLOCK, CARRIER)[0]
            exact = (np.sin(np.pi * CARRIER * x / BLOCK)
                     / np.sin(np.pi * x / BLOCK) / CARRIER)
            assert got == pytest.approx(exact, rel=1e-6)

    def test_derivative_matches_numerical(self):
        x = np.array([0.3, 1.7, -2.2, 0.0])
        h = 1e-6
        num = (dirichlet.dirichlet_kernel(x + h, BLOCK, CARRIER)
               - dirichlet.dirichlet_kernel(x - h, BLOCK, CARRIER)) / (2 * h)
        got = dirichlet.dirichlet_kernel_deriv(x, BLOCK, CARRIER)
        np.testing.assert_allclose(got, num, atol=1e-5)

    def test_weights_unit_energy(self):
        w = dirichlet.dirichlet_weights(7, BLOCK, CARRIER)
        assert np.sum(w**2) == pytest.approx(1.0)


class TestInterpolator:
    @pytest.mark.parametrize(
        "offset", [-0.51, -0.3, -0.05, 0.0, 0.1, 0.33, 0.49, 0.56])
    def test_recovers_fractional_offset(self, offset):
        interp = dirichlet.make_dirichlet_interpolator(BLOCK, CARRIER)
        mag = tone_mag(100 + offset)[None, :]
        peak_idx = np.array([100 if offset < 0.5 else 101])
        delta = np.asarray(interp(mag, peak_idx))
        true_delta = 100 + offset - peak_idx[0]
        assert float(delta[0]) == pytest.approx(true_delta, abs=2e-3)

    def test_batched(self):
        interp = dirichlet.make_dirichlet_interpolator(BLOCK, CARRIER)
        offs = [-0.4, 0.0, 0.25]
        mags = np.stack([tone_mag(50 + o) for o in offs])
        deltas = np.asarray(interp(mags, np.array([50, 50, 50])))
        np.testing.assert_allclose(deltas, offs, atol=2e-3)

    def test_amplitude_output(self):
        interp = dirichlet.make_dirichlet_interpolator(
            BLOCK, CARRIER, return_amplitude=True)
        mag = tone_mag(77.2)[None, :]
        amp, delta = interp(mag, np.array([77]))
        assert float(delta[0]) == pytest.approx(0.2, abs=2e-3)
        assert float(amp[0]) == pytest.approx(CARRIER, rel=1e-2)

    def test_agrees_with_scipy_curve_fit(self):
        # Cross-validate the fixed-iteration Gauss-Newton fit against the
        # reference's iterative scipy fit (thrifty/carrier_sync.py:150-196).
        from thrifty_tpu.oracle.numpy_ref import OracleDetector
        from thrifty_tpu import sim

        tpl = sim.make_template()
        oracle = OracleDetector(tpl, block_len=16384, history_len=4920,
                                carrier_window=(7, 110))
        interp = dirichlet.make_dirichlet_interpolator(16384, len(tpl))
        rng = np.random.default_rng(5)
        for offset in [-0.45, -0.2, 0.01, 0.37]:
            t = np.arange(len(tpl))
            x = np.zeros(16384, dtype=np.complex128)
            x[1000:1000 + len(tpl)] = np.exp(
                2j * np.pi * (60 + offset) * t / 16384)
            x += 0.01 * (rng.normal(size=16384) + 1j * rng.normal(size=16384))
            mag = np.abs(np.fft.fft(x))
            ours = float(np.asarray(interp(mag[None, :], np.array([60])))[0])
            theirs = oracle.carrier_interpolate(mag, 60)
            assert ours == pytest.approx(theirs, abs=1e-4)


class TestSimpleInterpolators:
    def test_parabolic_on_parabola(self):
        # Exact on a true parabola with vertex at 10.3.
        x = np.arange(32, dtype=np.float64)
        y = (50 - (x - 10.3) ** 2)[None, :]
        off = dirichlet.parabolic_interpolate(y, np.array([10]))
        assert float(off[0]) == pytest.approx(0.3, abs=1e-9)

    def test_polyfit_on_parabola(self):
        x = np.arange(32, dtype=np.float64)
        y = (50 - (x - 12.6) ** 2)[None, :]
        interp = dirichlet.make_polyfit_interpolator(4)
        off = interp(y, np.array([13]))
        assert float(off[0]) == pytest.approx(-0.4, abs=1e-9)
