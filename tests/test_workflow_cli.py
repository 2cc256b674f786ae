"""The reference's complete deployment workflow, driven purely through
the umbrella CLI on files: per-receiver raw IQ stream -> carrier-gated
.card archive (capture thinning) -> detect -> identify -> match ->
tdoa -> pos, with the recovered position checked against the simulated
geometry.  This is the file-mediated pipeline of README.rst:47-64 with
fastcard's role played by `thrifty-tpu capture --raw-in`.
"""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.cli import main
from thrifty_tpu.dsp import iq
from thrifty_tpu.io import card
from thrifty_tpu.pipeline import pos as pos_mod

FS = 2.4e6
HISTORY = 4920
RX_POS = {
    0: np.array([0.0, 0.0]),
    1: np.array([9000.0, 500.0]),
    2: np.array([4000.0, 8000.0]),
}
BEACON_POS = {9: np.array([4500.0, 3000.0])}
MOBILE_POS = {3: np.array([6000.0, 2500.0])}
T0 = 1.5e9


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("workflow")
    tpl = sim.make_template()
    schedule = [(9, t) for t in np.arange(0.02, 0.36, 0.05)]
    schedule += [(3, t) for t in (0.085, 0.185, 0.285)]
    caps = sim.synth_rx_captures(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, {9: 30, 3: 70}, schedule,
        template=tpl, num_blocks=80, amplitude=0.6, noise_std=0.04,
        clock_offsets={1: 777.25, 2: -123.5},
        clock_drifts={1: 3e-6, 2: -2e-6}, seed=11, t0=T0)
    for rxid, cap in caps.items():
        stream = cap.blocks[:, HISTORY:].reshape(-1)
        iq.iq_to_raw(stream).tofile(str(d / "rx{}.bin".format(rxid)))
    np.save(str(d / "template.npy"), tpl)
    with open(d / "freq-map.cfg", "w") as f:
        # Reference format (rpi/freq-map.cfg): tx ranges + per-receiver
        # offset lines; receivers without an @ line are unmapped.
        f.write("9: 25 - 35\n3: 65 - 75\n@0: 0\n@1: 0\n@2: 0\n")
    with open(d / "pos-rx.cfg", "w") as f:
        for rxid, p in RX_POS.items():
            f.write("{}: {} {}\n".format(rxid, p[0], p[1]))
    with open(d / "pos-beacon.cfg", "w") as f:
        for txid, p in BEACON_POS.items():
            f.write("{}: {} {}\n".format(txid, p[0], p[1]))
    return d


def test_full_cli_workflow(workdir):
    d = workdir
    common = ["--carrier-window", "7-110"]
    # L1: capture thinning per receiver.
    for rxid in RX_POS:
        assert main(["capture", "--raw-in", str(d / f"rx{rxid}.bin"),
                     "-o", str(d / f"rx{rxid}.card"), "--quiet",
                     "--t0", str(T0)] + common) == 0
        _, idx, _ = card.read_card(str(d / f"rx{rxid}.card"))
        assert 0 < len(idx) < 80, "no thinning at rx{}".format(rxid)
    # L2: detect per receiver.
    for rxid in RX_POS:
        assert main(["detect", str(d / f"rx{rxid}.card"),
                     "-o", str(d / f"rx{rxid}.toad"), "--quiet",
                     "--template", str(d / "template.npy"),
                     "--rxid", str(rxid)] + common) == 0
    # L3: identify + match.
    assert main(["identify", str(d / "rx0.toad"), str(d / "rx1.toad"),
                 str(d / "rx2.toad"), "-o", str(d / "data.toads"),
                 "-m", str(d / "freq-map.cfg")]) == 0
    assert main(["match", str(d / "data.toads"),
                 "-o", str(d / "data.match"), "-w", "0.02"]) == 0
    # L4: tdoa + pos.
    assert main(["tdoa", str(d / "data.toads"), str(d / "data.match"),
                 "-o", str(d / "data.tdoa"),
                 "-r", str(d / "pos-rx.cfg"),
                 "-b", str(d / "pos-beacon.cfg")]) == 0
    assert main(["pos", str(d / "data.tdoa"),
                 "-o", str(d / "data.pos"),
                 "-r", str(d / "pos-rx.cfg"), "--batched"]) == 0

    fixes = pos_mod.load_positions(str(d / "data.pos"))
    assert len(fixes) == 3, "expected one fix per mobile transmission"
    for row in fixes:
        est = np.array([row["x"], row["y"]])
        err = np.linalg.norm(est - MOBILE_POS[3])
        assert err < 60.0, "position error {} m".format(err)


def test_capture_t0_timestamps(workdir):
    """--t0 stamps are deterministic stream-position times."""
    d = workdir
    ts, idx, _ = card.read_card(str(d / "rx0.card"))
    block_dt = (16384 - HISTORY) / FS
    np.testing.assert_allclose(ts, T0 + idx * block_dt, atol=1e-6)


def test_capture_t0_header_deterministic(workdir):
    """With --t0 the header's start_time is the deterministic stream
    start, not the wall clock: re-recording the same stream must yield
    a byte-identical archive."""
    with open(workdir / "rx0.card") as f:
        header = [l for l in f if l.startswith("#")]
    assert any("start_time: {:.6f}".format(T0) in l for l in header)


def test_detect_raw_t0_timestamps(workdir, tmp_path):
    """detect --raw --t0 stamps like the recorder (offline re-analysis
    of a recorded stream is reproducible)."""
    from thrifty_tpu.io import toad as toad_mod

    d = workdir
    out = str(tmp_path / "t0.toad")
    assert main(["detect", str(d / "rx0.bin"), "--raw", "-o", out,
                 "--quiet", "--t0", str(T0),
                 "--template", str(d / "template.npy"),
                 "--carrier-window", "7-110"]) == 0
    recs = toad_mod.load_toad(out)
    assert len(recs) > 0
    block_dt = (16384 - HISTORY) / FS
    np.testing.assert_allclose(
        recs["timestamp"], T0 + recs["block"] * block_dt, atol=1e-6)
