"""Code-division network: transmitters share one carrier frequency and
are identified by their Gold code via a detector template bank --
a capability beyond the reference's frequency-division identification.
"""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.dsp import template as template_mod
from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
from thrifty_tpu.pipeline import kitchen_sink

FS = 2.4e6
RX_POS = {
    0: np.array([0.0, 0.0]),
    1: np.array([9000.0, 500.0]),
    2: np.array([4000.0, 8000.0]),
}
BEACON_POS = {0: np.array([4500.0, 3000.0])}   # txid = bank index
MOBILE_POS = {2: np.array([6000.0, 2500.0])}
SHARED_BIN = 40  # every transmitter on the same carrier


@pytest.fixture(scope="module")
def result():
    """The whole code-division flow through the ADVERTISED composition:
    synth_rx_captures(tx_codes=...) -> bank detect_all(txid_from_
    template) -> postdetect(keep_txid=True settings) -- no hand-rolled
    streams and no integrator injection."""
    sps = FS / 0.999707e6
    bank = template_mod.generate_bank(11, [0, 1, 2], sps)
    schedule = [(0, t) for t in np.arange(0.02, 0.36, 0.05)]  # beacon
    schedule += [(2, t) for t in (0.085, 0.185, 0.285)]       # mobile

    # Same carrier bin for both transmitters; distinct codes.
    caps = {}
    for rxid, cap in sim.synth_rx_captures(
            RX_POS, {**BEACON_POS, **MOBILE_POS},
            {0: SHARED_BIN, 2: SHARED_BIN}, schedule,
            template=bank[0], num_blocks=80, amplitude=0.6,
            noise_std=0.04,
            clock_offsets={1: 777.25, 2: -123.5},
            clock_drifts={1: 3e-6, 2: -2e-6}, seed=11,
            tx_codes={0: bank[0], 2: bank[2]}).items():
        caps[rxid] = (cap.timestamps, cap.indices, cap.blocks)

    detector = BatchDetector(bank, DetectorConfig(carrier_window=(7, 110)))
    detections = kitchen_sink.detect_all(
        caps, detector, batch_size=16, txid_from_template=True)

    settings = kitchen_sink.PostdetectSettings(
        freqmap=None, match_window=0.02, tdoa_est_window=8.0,
        rx_pos=RX_POS, beacon_pos=BEACON_POS, sample_rate=FS,
        keep_txid=True)
    return kitchen_sink.postdetect(detections, settings)


@pytest.fixture(scope="module")
def bank_capture():
    """A small capture using code #1 of a 3-code bank."""
    sps = FS / 0.999707e6
    bank = template_mod.generate_bank(11, [0, 1, 2], sps)
    cap = sim.synth_capture(
        num_blocks=12, bursts_every=3, template=bank[1],
        carrier_bin=40.25, amplitude=0.5, noise_std=0.05, seed=5)
    return bank, cap


@pytest.mark.parametrize("sync_mode", ["fractional", "integer", "preshift"])
@pytest.mark.parametrize("corr_interp",
                         ["gaussian", "parabolic", "cosine", "autocorr"])
def test_bank_all_modes(bank_capture, sync_mode, corr_interp):
    """Template banks work in every sync mode and corr interpolator:
    the transmitted code is identified, SoA stays sub-sample accurate."""
    bank, cap = bank_capture
    det = BatchDetector(bank, DetectorConfig(
        carrier_window=(7, 110), sync_mode=sync_mode,
        corr_interp=corr_interp))
    out = {k: np.asarray(v) for k, v in det(cap.blocks).items()}
    soa = det.soa(cap.indices, out["corr_sample"], out["corr_offset"])
    errs = []
    for burst in cap.bursts:
        i = burst.block_idx
        assert out["detected"][i], (sync_mode, corr_interp, i)
        assert int(out["template_idx"][i]) == 1, (sync_mode, corr_interp)
        errs.append(soa[i] - burst.expected_soa)
    # Integer-mode residual carrier error costs accuracy; still sub-sample.
    tol = 0.6 if sync_mode == "integer" else 0.12
    rms = float(np.sqrt(np.mean(np.square(errs))))
    assert rms < tol, (sync_mode, corr_interp, rms)


def test_codes_identified_on_shared_carrier(result):
    txids = set(np.unique(result.toads["txid"]))
    assert txids == {0, 2}
    # All detections sit on the shared carrier bin.
    assert np.all(np.abs(result.toads["carrier_bin"] - SHARED_BIN) <= 1)
    # 10 transmissions x 3 receivers survive dedup.
    assert len(result.toads) == 30


def test_positions_recovered(result):
    assert len(result.pos) == 3
    for row in result.pos:
        est = np.array([row["x"], row["y"]])
        assert np.linalg.norm(est - MOBILE_POS[2]) < 60.0
