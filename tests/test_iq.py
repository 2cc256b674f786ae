import numpy as np

from thrifty_tpu.dsp import iq


def test_raw_to_iq_values():
    raw = np.array([0, 128, 255, 127], dtype=np.uint8)
    out = iq.raw_to_iq(raw)
    assert out.dtype == np.complex64
    np.testing.assert_allclose(out[0].real, (0 - 127.4) / 128, rtol=1e-6)
    np.testing.assert_allclose(out[0].imag, (128 - 127.4) / 128, rtol=1e-5)
    np.testing.assert_allclose(out[1].real, (255 - 127.4) / 128, rtol=1e-6)


def test_round_trip_byte_exact():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=4096, dtype=np.uint8)
    back = iq.iq_to_raw(iq.raw_to_iq(raw))
    np.testing.assert_array_equal(raw, back)


def test_batched_shape():
    raw = np.zeros((3, 64), dtype=np.uint8)
    out = iq.raw_to_iq(raw)
    assert out.shape == (3, 32)


def test_jax_matches_numpy():
    import jax
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(2, 128), dtype=np.uint8)
    host = iq.raw_to_iq(raw)
    dev = np.asarray(iq.raw_to_iq_jax(raw))
    np.testing.assert_allclose(host, dev, atol=1e-7)
