"""Full-pipeline integration test: signal-level 3-receiver network.

Synthesizes raw IQ for three receivers with drifting clocks observing a
beacon and a mobile transmitter, then runs the complete pipeline
(detect -> identify -> match -> tdoa -> pos) and checks the recovered
position against the simulated geometry.
"""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
from thrifty_tpu.pipeline import kitchen_sink

FS = 2.4e6

RX_POS = {
    0: np.array([0.0, 0.0]),
    1: np.array([9000.0, 500.0]),
    2: np.array([4000.0, 8000.0]),
}
BEACON_POS = {9: np.array([4500.0, 3000.0])}
MOBILE_POS = {3: np.array([6000.0, 2500.0])}
TX_BINS = {9: 30, 3: 70}
MOBILE_TIMES = [0.085, 0.185, 0.285]


@pytest.fixture(scope="module")
def pipeline_result():
    tpl = sim.make_template()
    schedule = [(9, t) for t in np.arange(0.02, 0.36, 0.05)]
    schedule += [(3, t) for t in MOBILE_TIMES]
    caps = sim.synth_rx_captures(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, TX_BINS, schedule,
        template=tpl, num_blocks=80, amplitude=0.6, noise_std=0.04,
        clock_offsets={1: 777.25, 2: -123.5},
        clock_drifts={1: 3e-6, 2: -2e-6},
        seed=11)

    detector = BatchDetector(tpl, DetectorConfig(carrier_window=(7, 110)))
    detections = kitchen_sink.detect_all(
        {r: (c.timestamps, c.indices, c.blocks) for r, c in caps.items()},
        detector, batch_size=16)

    freqmap = {r: {9: (25.0, 35.0), 3: (65.0, 75.0)} for r in RX_POS}
    settings = kitchen_sink.PostdetectSettings(
        freqmap=freqmap, match_window=0.02, tdoa_est_window=8.0,
        rx_pos=RX_POS, beacon_pos=BEACON_POS, sample_rate=FS)
    return caps, kitchen_sink.postdetect(detections, settings)


def test_detections_found(pipeline_result):
    caps, result = pipeline_result
    # Every receiver sees every transmission (10 per rx).
    for rxid in RX_POS:
        n_rx = np.sum(result.toads["rxid"] == rxid)
        assert n_rx == 10, "rx{}: {} detections".format(rxid, n_rx)


def test_soa_accuracy_vs_ground_truth(pipeline_result):
    """Detected SoAs match the simulated arrival times sub-sample."""
    caps, result = pipeline_result
    errs = []
    for rxid, cap in caps.items():
        rx_det = result.toads[result.toads["rxid"] == rxid]
        for burst in cap.bursts:
            hit = rx_det[rx_det["block"] == burst.block_idx]
            if len(hit) != 1:
                continue
            errs.append(float(hit["soa"][0]) - burst.expected_soa)
    assert len(errs) >= 25
    rms = np.sqrt(np.mean(np.square(errs)))
    assert rms < 0.05, "SoA RMS error {} samples".format(rms)


def test_identification(pipeline_result):
    caps, result = pipeline_result
    assert set(np.unique(result.toads["txid"])) == {3, 9}
    beacon = result.toads[result.toads["txid"] == 9]
    assert np.all(np.abs(beacon["carrier_bin"] - TX_BINS[9]) <= 1)


def test_matching(pipeline_result):
    caps, result = pipeline_result
    # 10 transmissions, each seen by 3 receivers.
    assert len(result.matches) == 10
    assert all(len(m) == 3 for m in result.matches)


def test_tdoa_accuracy(pipeline_result):
    caps, result = pipeline_result
    c = sim.SPEED_OF_LIGHT
    mobile = MOBILE_POS[3]
    assert len(result.tdoas) == len(MOBILE_TIMES)
    for group in result.tdoas:
        assert group.tx == 3
        for t in group.tdoas:
            want = (np.linalg.norm(mobile - RX_POS[int(t["rx0"])])
                    - np.linalg.norm(mobile - RX_POS[int(t["rx1"])])) / c
            err_ns = abs(float(t["tdoa"]) - want) * 1e9
            assert err_ns < 60, "TDOA error {} ns".format(err_ns)


def test_position_accuracy(pipeline_result):
    caps, result = pipeline_result
    assert len(result.pos) == len(MOBILE_TIMES)
    for row in result.pos:
        est = np.array([row["x"], row["y"]])
        err = np.linalg.norm(est - MOBILE_POS[3])
        assert err < 60.0, "position error {} m".format(err)
        assert row["dop"] > 0


def test_integer_mode_end_to_end(pipeline_result):
    """fastdet-exact integer sync through the whole pipeline: positions
    within the same bound as the fractional path (the residual
    fractional carrier error costs sub-sample SoA accuracy, not
    position-level accuracy at these SNRs)."""
    caps, _ = pipeline_result
    detector = BatchDetector(
        caps[0].template if hasattr(caps[0], "template")
        else sim.make_template(),
        DetectorConfig(carrier_window=(7, 110), sync_mode="integer"))
    detections = kitchen_sink.detect_all(
        {r: (c.timestamps, c.indices, c.blocks) for r, c in caps.items()},
        detector, batch_size=16)
    freqmap = {r: {9: (25.0, 35.0), 3: (65.0, 75.0)} for r in RX_POS}
    settings = kitchen_sink.PostdetectSettings(
        freqmap=freqmap, match_window=0.02, tdoa_est_window=8.0,
        rx_pos=RX_POS, beacon_pos=BEACON_POS, sample_rate=FS)
    result = kitchen_sink.postdetect(detections, settings)
    assert len(result.pos) == len(MOBILE_TIMES)
    for row in result.pos:
        est = np.array([row["x"], row["y"]])
        err = np.linalg.norm(est - MOBILE_POS[3])
        assert err < 75.0, "position error {} m".format(err)
