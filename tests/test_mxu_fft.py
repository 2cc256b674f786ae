"""MXU matmul FFT (dsp/mxu_fft.py) vs numpy, and in the detector."""

import numpy as np
import pytest

from thrifty_tpu.dsp import mxu_fft


def rand(b, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(b, n))
            + 1j * rng.normal(size=(b, n))).astype(np.complex64)


@pytest.mark.parametrize("n", [64, 256, 2048, 4096, 16384])
def test_matmul_fft_matches_numpy(n):
    x = rand(3, n, seed=n)
    ref = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(mxu_fft.fft(x, impl="matmul"))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < 2e-5, n


@pytest.mark.parametrize("n", [256, 4096, 16384])
def test_matmul_ifft_matches_numpy(n):
    x = rand(2, n, seed=n + 1)
    ref = np.fft.ifft(x.astype(np.complex128))
    got = np.asarray(mxu_fft.ifft(x, impl="matmul"))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < 2e-5, n


def test_roundtrip():
    x = rand(2, 16384, seed=7)
    back = np.asarray(mxu_fft.ifft(mxu_fft.fft(x, "matmul"), "matmul"))
    assert np.max(np.abs(back - x)) < 1e-4


def test_auto_is_xla_on_cpu():
    """On CPU 'auto' must keep jnp.fft numerics bit-for-bit (goldens
    and oracle tests rely on them)."""
    import jax.numpy as jnp

    x = rand(2, 1024, seed=3)
    np.testing.assert_array_equal(
        np.asarray(mxu_fft.fft(x, "auto")), np.asarray(jnp.fft.fft(x)))


def test_unfactorable_size_falls_back():
    """A size with no DFT-matrix or four-step plan still transforms
    correctly via the jnp fallback even under impl='matmul'."""
    x = rand(1, 6000, seed=4)  # 6000 not 128-divisible, > _DFT_MAX
    ref = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(mxu_fft.fft(x, impl="matmul"))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 2e-5


def test_bad_impl_rejected():
    with pytest.raises(ValueError, match="unknown fft impl"):
        mxu_fft.fft(rand(1, 64), impl="fast")


def test_leading_dims():
    x = rand(6, 16384, seed=9).reshape(2, 3, 16384)
    ref = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(mxu_fft.fft(x, impl="matmul"))
    assert got.shape == x.shape
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 2e-5


class TestDetectorEquivalence:
    def test_detector_matmul_fft_matches_xla(self):
        """Full detector with fft_impl='matmul' vs 'xla': identical
        decisions and peak indices, float surfaces within the matmul
        transform's f32-grade error."""
        from thrifty_tpu import sim
        from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig

        tpl = sim.make_template()
        cap = sim.synth_capture(num_blocks=12, bursts_every=3,
                                template=tpl, seed=11, quantize=True)
        outs = {}
        for impl in ("xla", "matmul"):
            det = BatchDetector(tpl, DetectorConfig(
                carrier_window=(7, 110), fft_impl=impl))
            outs[impl] = {k: np.asarray(v)
                          for k, v in det(cap.blocks).items()}
        a, b = outs["xla"], outs["matmul"]
        np.testing.assert_array_equal(a["detected"], b["detected"])
        np.testing.assert_array_equal(a["carrier_bin"], b["carrier_bin"])
        np.testing.assert_array_equal(a["corr_sample"], b["corr_sample"])
        np.testing.assert_allclose(a["corr_offset"], b["corr_offset"],
                                   atol=1e-3)
        np.testing.assert_allclose(a["corr_energy"], b["corr_energy"],
                                   rtol=1e-4)
        det_m = BatchDetector(tpl, DetectorConfig(
            carrier_window=(7, 110), fft_impl="matmul"))
        out = {k: np.asarray(v) for k, v in det_m(cap.blocks).items()}
        soa = det_m.soa(cap.indices, out["corr_sample"],
                        out["corr_offset"])
        for burst in cap.bursts:
            assert out["detected"][burst.block_idx]
            assert abs(soa[burst.block_idx] - burst.expected_soa) < 0.05

    def test_bad_fft_impl_rejected(self):
        from thrifty_tpu import sim
        from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig

        with pytest.raises(ValueError, match="unknown fft_impl"):
            BatchDetector(sim.make_template(),
                          DetectorConfig(fft_impl="fftw"))
