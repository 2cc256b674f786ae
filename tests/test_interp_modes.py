"""Selectable carrier / correlation interpolators in the detector."""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.dsp import template as template_mod
from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig

BLOCK, HISTORY = 2048, 256
TPL = template_mod.generate(7, 0, 2.0)  # 254 samples


@pytest.fixture(scope="module")
def capture():
    return sim.synth_capture(
        num_blocks=12, bursts_every=2, template=TPL, block_len=BLOCK,
        history_len=HISTORY, carrier_bin=40.3, amplitude=0.8,
        noise_std=0.03, seed=4, quantize=False)


@pytest.mark.parametrize("corr_interp",
                         ["gaussian", "parabolic", "cosine", "autocorr",
                          "maximise", "none"])
def test_corr_interpolators_accurate(capture, corr_interp):
    det = BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110),
        corr_interp=corr_interp))
    out = {k: np.asarray(v) for k, v in det(capture.blocks).items()}
    soa = det.soa(capture.indices, out["corr_sample"],
                  out["corr_offset"])
    errs = []
    for b in capture.bursts:
        if b.block_idx < 0:
            continue
        assert out["detected"][b.block_idx]
        errs.append(soa[b.block_idx] - b.expected_soa)
    rms = float(np.sqrt(np.mean(np.square(errs))))
    # 'none' reports integer peaks: error is the fractional truncation
    # (up to 0.5 samples); every real interpolator must beat 0.12 RMS.
    limit = 0.55 if corr_interp == "none" else 0.12
    assert rms < limit, "{}: SoA RMS {}".format(corr_interp, rms)


def test_maximise_matches_dense_search(capture):
    """The golden-section 'maximise' offset equals a brute-force dense
    evaluation of the band-limited |corr| to ~1e-3 samples."""
    import jax.numpy as jnp
    from thrifty_tpu.dsp import xcorr

    det = BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110),
        corr_interp="maximise"))
    out = {k: np.asarray(v) for k, v in det(capture.blocks).items()}
    # Rebuild the correlation spectrum exactly as the detector does.
    blocks = jnp.asarray(capture.blocks)
    fft = jnp.fft.fft(blocks)
    c_idx = jnp.asarray(out["carrier_bin"])
    c_off = jnp.asarray(out["carrier_offset"])
    _, spec = det._remove_carrier_and_despread(
        blocks, fft, c_idx, c_off, det.corr_len, with_spec=True)
    spec = np.asarray(spec)
    n = spec.shape[-1]
    k = np.arange(n)
    f_signed = np.fft.fftfreq(n)  # signed grid, as the reference uses
    for b in capture.bursts:
        if b.block_idx < 0:
            continue
        i = b.block_idx
        p = int(out["corr_sample"][i])
        cand = np.linspace(-0.55, 0.55, 2201)
        vals = np.abs(
            (spec[i][None, :] * np.exp(2j * np.pi * k[None, :] * p / n)
             * np.exp(2j * np.pi * f_signed[None, :] * cand[:, None])
             ).sum(axis=1))
        dense = cand[int(np.argmax(vals))]
        assert out["corr_offset"][i] == pytest.approx(dense, abs=2e-3)


@pytest.mark.parametrize("carrier_interp",
                         ["dirichlet", "parabolic", "polyfit",
                          "gaussian", "cosine", "none"])
def test_carrier_interpolators(capture, carrier_interp):
    det = BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110),
        carrier_interp=carrier_interp))
    out = {k: np.asarray(v) for k, v in det(capture.blocks).items()}
    for b in capture.bursts:
        if b.block_idx < 0:
            continue
        i = b.block_idx
        assert out["detected"][i]
        est = out["carrier_bin"][i] + out["carrier_offset"][i]
        # Simple interpolators are biased on Dirichlet-shaped peaks
        # (why the reference defaults to the curve fit); generous bound
        # for them, tight for the fit.  'none' reports the raw argmax
        # bin, which the wide Dirichlet mainlobe can place a bit beyond
        # the rounded true frequency.
        tol = {"dirichlet": 0.06, "none": 0.8}.get(carrier_interp, 0.45)
        assert est == pytest.approx(b.carrier_bin, abs=tol)


def test_invalid_interp_names():
    with pytest.raises(ValueError):
        BatchDetector(TPL, DetectorConfig(
            block_len=BLOCK, history_len=HISTORY, corr_interp="bogus"))
    with pytest.raises(ValueError):
        BatchDetector(TPL, DetectorConfig(
            block_len=BLOCK, history_len=HISTORY, carrier_interp="bogus"))


def test_maximise_large_power_of_two_block():
    """n = 65536 makes k * peak_idx exceed int32; the power-of-two
    wraparound formulation must still recover the exact fractional
    shift (a synthetic band-limited spectrum centered at p + 0.3)."""
    import jax.numpy as jnp
    from thrifty_tpu.dsp import xcorr

    n, p, true_off = 1 << 16, 50_000, 0.3  # k*p up to 3.3e9 > 2^31
    f = np.fft.fftfreq(n)
    spec = np.where(np.abs(f) < 0.25,
                    np.exp(-2j * np.pi * f * (p + true_off)),
                    0.0).astype(np.complex64)
    interp = xcorr.make_maximise_interpolator()
    off = np.asarray(interp(jnp.asarray(spec[None, :]),
                            jnp.asarray([p], dtype=jnp.int32)))
    np.testing.assert_allclose(off, [true_off], atol=1e-3)


def test_maximise_unsupported_block_len_raises():
    import jax.numpy as jnp
    from thrifty_tpu.dsp import xcorr

    n = 50_000  # not a power of two and >= 46341
    interp = xcorr.make_maximise_interpolator()
    with pytest.raises(ValueError, match="power of"):
        interp(jnp.zeros((1, n), jnp.complex64),
               jnp.zeros((1,), jnp.int32))
