"""Analysis CLIs on simulated pipeline outputs."""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.dsp import iq
from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
from thrifty_tpu.io import card, toad
from thrifty_tpu.pipeline import kitchen_sink, tdoa as tdoa_mod
from thrifty_tpu.analysis import (
    beacon_analysis, detect_analysis, tdoa_analysis, toads_analysis)

FS = 2.4e6
RX_POS = {
    0: np.array([0.0, 0.0]),
    1: np.array([9000.0, 500.0]),
    2: np.array([4000.0, 8000.0]),
}
BEACON_POS = {9: np.array([4500.0, 3000.0])}
MOBILE_POS = {3: np.array([6000.0, 2500.0])}


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("analysis")
    tpl = sim.make_template()
    schedule = [(9, t) for t in np.arange(0.02, 0.36, 0.05)]
    schedule += [(3, t) for t in (0.085, 0.185, 0.285)]
    caps = sim.synth_rx_captures(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, {9: 30, 3: 70}, schedule,
        template=tpl, num_blocks=80, amplitude=0.6, noise_std=0.04,
        clock_offsets={1: 777.25, 2: -123.5},
        clock_drifts={1: 3e-6, 2: -2e-6}, seed=11)

    detector = BatchDetector(tpl, DetectorConfig(carrier_window=(7, 110)))
    detections = kitchen_sink.detect_all(
        {r: (c.timestamps, c.indices, c.blocks) for r, c in caps.items()},
        detector, batch_size=16)
    freqmap = {r: {9: (25.0, 35.0), 3: (65.0, 75.0)} for r in RX_POS}
    settings = kitchen_sink.PostdetectSettings(
        freqmap=freqmap, match_window=0.02, tdoa_est_window=8.0,
        rx_pos=RX_POS, beacon_pos=BEACON_POS, sample_rate=FS)
    result = kitchen_sink.postdetect(detections, settings)

    toad.save(str(d / "data.toads"), result.toads,
              with_rxid=True, with_txid=True)
    tdoa_mod.save_tdoa_groups(str(d / "data.tdoa"), result.tdoas)
    card.write_card(str(d / "rx0.card"), caps[0].timestamps,
                    caps[0].indices, iq.iq_to_raw(caps[0].blocks))
    np.save(str(d / "template.npy"), tpl)
    return d


def test_toads_stats(world, capsys):
    toads_analysis._main([str(world / "data.toads"), "--per-rxtx"])
    out = capsys.readouterr().out
    assert "Number of detections: 30" in out
    assert "Carrier SNR (dB)" in out
    assert "# Stats for RX #2 / TX #9:" in out


def test_toads_plot_export(world, tmp_path, capsys):
    out = str(tmp_path / "cols.png")
    toads_analysis._main([str(world / "data.toads"),
                          "--plot", "freqs,snr,energy", "--export", out])
    capsys.readouterr()
    import os
    assert os.path.getsize(out) > 1000


def test_tdoa_stats(world, capsys):
    tdoa_analysis._main([str(world / "data.tdoa"),
                         "--rx0", "0", "--rx1", "1", "--tx", "3"])
    out = capsys.readouterr().out
    assert "Number of TDOAs: 3" in out
    # The bias equals the geometric TDOA (we measure raw TDOA, not
    # residual): |bias| < 20 km sanity and std below 10 m.
    std = float([l for l in out.splitlines()
                 if "std dev" in l][0].split()[-2])
    assert std < 10.0


def test_beacon_analysis(world, capsys):
    rc = beacon_analysis._main([str(world / "data.toads"), "0", "1", "9",
                                "-w", "0.02"])
    out = capsys.readouterr().out
    assert rc is None
    assert "Number of detection groups: 7" in out
    std_m = float([l for l in out.splitlines()
                   if "std dev" in l][0].split("std dev = ")[1].split()[0])
    assert std_m < 20.0  # clock sync residual well under 20 m


def test_detect_analysis_stats_and_npz(world, capsys, tmp_path):
    npz = str(tmp_path / "diag.npz")
    detect_analysis._main([
        str(world / "rx0.card"), "--blocks", "4",
        "--save-npz", npz,
        "--template", str(world / "template.npy"),
        "--carrier-window", "7 - 110"])
    out = capsys.readouterr().out
    assert "block 4: carrier: yes" in out
    data = np.load(npz)
    assert "b4_corr_mag" in data


def test_detect_analysis_fastdet_mode(world, capsys):
    """--fastdet analyzes with fastdet's exact numerics: offsets are
    clipped to +-0.5 and the carrier offset is parabolic."""
    detect_analysis._main([
        str(world / "rx0.card"), "--blocks", "4", "--fastdet",
        "--template", str(world / "template.npy"),
        "--carrier-window", "7 - 110"])
    out = capsys.readouterr().out
    assert "block 4: carrier: yes" in out
    import re
    offs = [float(x) for x in re.findall(r"@ (?:bin )?-?\d+([+-]\d+\.\d+)",
                                         out)]
    assert offs and all(abs(o) <= 0.5 for o in offs)


def test_detect_analysis_export_pdf(world, tmp_path):
    pdf = str(tmp_path / "diag.pdf")
    detect_analysis._main([
        str(world / "rx0.card"), "--blocks", "4", "--export", pdf,
        "--template", str(world / "template.npy"),
        "--carrier-window", "7 - 110"])
    import os
    assert os.path.getsize(pdf) > 1000
    # A detected block renders every view (reference detect_analysis
    # exposes ~18 plot commands; all have analogs here).
    with open(pdf, "rb") as f:
        pages = f.read().count(b"/Type /Page ")
    assert pages >= len(detect_analysis.PLOTS)


def test_interactive_viewer_navigation(tmp_path):
    """Key-nav browser: arrows cycle blocks/views, unavailable views
    degrade to a notice instead of crashing (the headless re-design of
    the reference's PyQt4 browser, detect_analysis.py:555-621)."""
    import matplotlib
    matplotlib.use("Agg")

    from thrifty_tpu import sim
    from thrifty_tpu.analysis import detect_analysis as da
    from thrifty_tpu.oracle.numpy_ref import OracleDetector

    tpl = sim.make_template()
    cap = sim.synth_capture(num_blocks=8, bursts_every=3, template=tpl,
                            seed=4)
    oracle = OracleDetector(tpl, carrier_window=(7, 110))
    diags = []
    for i in range(4):
        d = da.BlockDiagnostics(oracle, cap.blocks[i].astype(complex), tpl)
        diags.append((i, d))
    viewer = da.InteractiveViewer(diags, list(da.PLOTS))

    class Key:
        def __init__(self, key):
            self.key = key

    assert viewer.current[0][0] == 0
    viewer.on_key(Key("right"))
    assert viewer.current[0][0] == 1
    viewer.on_key(Key("left"))
    viewer.on_key(Key("left"))
    assert viewer.current[0][0] == 3, "wraps around"
    name0 = viewer.current[1]
    viewer.on_key(Key("down"))
    assert viewer.current[1] != name0
    viewer.on_key(Key("up"))
    assert viewer.current[1] == name0
    # Walk every (block, view) combination: none may raise, including
    # views that need a corr/carrier detection the block lacks.
    for _ in range(len(diags)):
        for _ in range(len(da.PLOTS)):
            viewer.on_key(Key("down"))
        viewer.on_key(Key("right"))
    viewer.on_key(Key("q"))
