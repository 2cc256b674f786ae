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
                         ["gaussian", "parabolic", "cosine", "autocorr"])
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
    assert rms < 0.12, "{}: SoA RMS {}".format(corr_interp, rms)


@pytest.mark.parametrize("carrier_interp",
                         ["dirichlet", "parabolic", "polyfit"])
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
        # for them, tight for the fit.
        tol = 0.06 if carrier_interp == "dirichlet" else 0.45
        assert est == pytest.approx(b.carrier_bin, abs=tol)


def test_invalid_interp_names():
    with pytest.raises(ValueError):
        BatchDetector(TPL, DetectorConfig(
            block_len=BLOCK, history_len=HISTORY, corr_interp="bogus"))
    with pytest.raises(ValueError):
        BatchDetector(TPL, DetectorConfig(
            block_len=BLOCK, history_len=HISTORY, carrier_interp="bogus"))
