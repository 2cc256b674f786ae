"""Capture: carrier-gated .card recorder, card tee, wrapper flags."""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.config import settings as st
from thrifty_tpu.dsp import iq
from thrifty_tpu.io import card, toad
from thrifty_tpu.pipeline import capture


HISTORY = 4920


@pytest.fixture(scope="module")
def raw_capture(tmp_path_factory):
    """A synthetic capture + its contiguous raw uint8 stream on disk."""
    tmp = tmp_path_factory.mktemp("rawcap")
    tpl = sim.make_template()
    cap = sim.synth_capture(
        num_blocks=16, bursts_every=4, template=tpl,
        carrier_bin=40.25, amplitude=0.5, noise_std=0.05, seed=21)
    # The contiguous stream is the concatenation of each block's new
    # samples (overlap-save inverse).
    stream = cap.blocks[:, HISTORY:].reshape(-1)
    raw_path = tmp / "rx.bin"
    iq.iq_to_raw(stream).tofile(str(raw_path))
    tpl_path = tmp / "template.npy"
    np.save(str(tpl_path), tpl)
    return cap, str(raw_path), str(tpl_path), tmp


def test_capture_recorder_gates_card(raw_capture):
    """raw stream -> carrier-gated .card: every burst block archived,
    pure-noise blocks thinned out (fastcard_cli.c:156-196 behavior)."""
    from thrifty_tpu.cli import main

    cap, raw_path, _, tmp = raw_capture
    out_path = str(tmp / "gated.card")
    rc = main(["capture", "--raw-in", raw_path, "-o", out_path,
               "--quiet", "--carrier-window", "7-110", "-k", "0"])
    assert rc == 0

    with open(out_path) as f:
        head = f.read(400)
    assert head.startswith("# arguments: { carrier_bin: '7-110'")
    assert "# tool: 'thrifty-tpu capture'" in head

    ts, idx, raw = card.read_card(out_path)
    burst_blocks = {b.block_idx for b in cap.bursts}
    assert burst_blocks <= set(idx.tolist()), "a burst block was not archived"
    assert len(idx) < 16, "no thinning happened (all blocks archived)"
    # Archived rows must hold the exact raw bytes of those blocks.
    for row_i, blk in enumerate(idx):
        np.testing.assert_array_equal(
            raw[row_i], iq.iq_to_raw(cap.blocks[blk]))


def test_capture_recorder_roundtrip_detect(raw_capture):
    """detect on the gated .card == detect on the raw stream (the
    capture -> archive -> re-analyze workflow)."""
    from thrifty_tpu.cli import main

    cap, raw_path, tpl_path, tmp = raw_capture
    card_path = str(tmp / "rt.card")
    # -k 0: skip>0 renumbers the archive's time base (reference
    # semantics), which would shift block indices vs the raw run.
    assert main(["capture", "--raw-in", raw_path, "-o", card_path,
                 "--quiet", "--carrier-window", "7-110", "-k", "0"]) == 0

    toad_raw = str(tmp / "raw.toad")
    toad_card = str(tmp / "card.toad")
    common = ["--quiet", "--carrier-window", "7-110",
              "--template", tpl_path]
    assert main(["detect", raw_path, "--raw", "-o", toad_raw] + common) == 0
    assert main(["detect", card_path, "-o", toad_card] + common) == 0

    a, b = toad.load_toad(toad_raw), toad.load_toad(toad_card)
    assert len(a) == len(b) and len(a) >= len(cap.bursts)
    np.testing.assert_array_equal(a["block"], b["block"])
    np.testing.assert_allclose(a["soa"], b["soa"], atol=1e-9)
    np.testing.assert_allclose(a["energy"], b["energy"], rtol=1e-6)


def test_capture_skip_discards_settle_blocks(raw_capture):
    """capture_skip drops the first blocks (SDR settling) and RENUMBERS
    the survivors: the reference initializes the block counter to
    -skip-1 (fastcard.c:108-109), so stream chunk k archives as index
    k - skip (fastcard_cli.c:148-171)."""
    from thrifty_tpu.cli import main

    cap, raw_path, _, tmp = raw_capture
    base_path = str(tmp / "noskip.card")
    out_path = str(tmp / "skipped.card")
    rc = main(["capture", "--raw-in", raw_path, "-o", base_path,
               "--quiet", "--carrier-window", "7-110", "-k", "0"])
    assert rc == 0
    rc = main(["capture", "--raw-in", raw_path, "-o", out_path,
               "--quiet", "--carrier-window", "7-110", "-k", "6"])
    assert rc == 0
    _, idx0, raw0 = card.read_card(base_path)
    _, idx, raw = card.read_card(out_path)
    assert len(idx) > 0
    kept = idx0 >= 6  # chunks the skip run must retain, renumbered
    np.testing.assert_array_equal(idx, idx0[kept] - 6)
    np.testing.assert_array_equal(raw, raw0[kept])


def test_capture_from_pipe(raw_capture):
    """The recorder consumes a pipe (the FIFO deployment mode)."""
    import subprocess
    import sys
    import os

    cap, raw_path, _, tmp = raw_capture
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out_path = str(tmp / "piped.card")
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys; from thrifty_tpu.cli import main; "
            "sys.exit(main(['capture', '--raw-in', '-', '-o', {!r}, "
            "'--quiet', '--carrier-window', '7-110']))".format(out_path))
    with open(raw_path, "rb") as raw_in:
        res = subprocess.run([sys.executable, "-c", code], env=env,
                             stdin=raw_in, capture_output=True,
                             text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-800:]
    _, idx, _ = card.read_card(out_path)
    burst_blocks = {b.block_idx for b in cap.bursts}
    assert burst_blocks <= set(idx.tolist())


def test_detect_card_tee_roundtrip(raw_capture):
    """detect --raw --card-out: the tee holds exactly the detected
    blocks, and re-detecting the tee reproduces the detections
    (fastdet/fastdet.cpp:210-219)."""
    from thrifty_tpu.cli import main

    cap, raw_path, tpl_path, tmp = raw_capture
    tee_path = str(tmp / "tee.card")
    toad_a = str(tmp / "a.toad")
    toad_b = str(tmp / "b.toad")
    common = ["--quiet", "--carrier-window", "7-110",
              "--template", tpl_path]
    assert main(["detect", raw_path, "--raw", "-o", toad_a,
                 "--card-out", tee_path] + common) == 0
    a = toad.load_toad(toad_a)
    _, tee_idx, _ = card.read_card(tee_path)
    np.testing.assert_array_equal(np.sort(tee_idx), np.sort(a["block"]))

    assert main(["detect", tee_path, "-o", toad_b] + common) == 0
    b = toad.load_toad(toad_b)
    np.testing.assert_array_equal(a["block"], b["block"])
    np.testing.assert_allclose(a["soa"], b["soa"], atol=1e-9)


def test_build_args_translation():
    values = st.load_settings(config_file=iter([
        "sample_rate: 2.4M",
        "tuner_freq: 433.83M",
        "tuner_gain: 29",
        "block_size: 16384",
        "block_history: 4920",
        "carrier_window: 7 - 110",
        "carrier_threshold: 100c+2s",
        "capture_skip: 20000",
    ]))
    ns = st.Namespace(values)
    args = capture.build_args(ns, output="rx.card")
    joined = " ".join(args)
    assert "-i rtlsdr" in joined
    assert "-s 2400000.0" in joined
    assert "-f 433830000" in joined
    assert "-b 16384" in joined
    assert "-h 4920" in joined
    assert "-w 7-110" in joined
    assert "-t 100.0c2.0s" in joined
    assert "-k 20000" in joined
    assert "-o rx.card" in joined


def test_capture_cli_missing_binary(tmp_path):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import sys; from thrifty_tpu.cli import main; "
            "sys.exit(main(['capture', '--capture-cmd', "
            "'definitely-not-a-binary-xyz', '-o', 'out.card']))")
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=str(tmp_path), capture_output=True,
                         text=True, timeout=120)
    assert res.returncode == 1
    assert "not found" in res.stderr


def test_detect_loads_tpl_template(tmp_path):
    from thrifty_tpu.dsp import template as template_mod
    from thrifty_tpu.io import tpl

    template = template_mod.generate(5, 0, 2.0)
    path = str(tmp_path / "t.tpl")
    tpl.save_tpl(path, template)
    loaded = tpl.load_template(path)
    np.testing.assert_allclose(loaded, template, atol=1e-6)
    npy = str(tmp_path / "t.npy")
    np.save(npy, template)
    np.testing.assert_allclose(tpl.load_template(npy), template)


def test_capture_roundtrip_random_geometries(tmp_path):
    """capture -> .card -> detect == detect-on-raw at random
    (template, block, history) geometries, byte-identical .toad files
    -- extends the fixed-geometry round trip above the same way the
    detector fuzzes do."""
    from thrifty_tpu.cli import main
    from thrifty_tpu.dsp import template as template_mod

    rng = np.random.default_rng(20260821)
    trials = 0
    while trials < 3:
        bits = int(rng.integers(5, 8))
        tpl = template_mod.generate(bits, 0, float(rng.uniform(1.8, 2.4)))
        tlen = len(tpl)
        block = int(2 ** rng.integers(10, 13))
        lo, hi = tlen + 1, block // 2
        if lo >= hi:
            continue
        hist = int(rng.integers(lo, hi))
        try:
            cap = sim.synth_capture(
                num_blocks=10, bursts_every=3, template=tpl,
                block_len=block, history_len=hist, carrier_bin=20.25,
                amplitude=0.7, noise_std=0.04, seed=50 + trials)
        except ValueError:
            continue
        trials += 1
        d = tmp_path / ("g%d" % trials)
        d.mkdir()
        raw_path = str(d / "rx.bin")
        iq.iq_to_raw(cap.blocks[:, hist:].reshape(-1)).tofile(raw_path)
        tpl_path = str(d / "tpl.npy")
        np.save(tpl_path, tpl)
        geom = ["--block-size", str(block), "--history", str(hist),
                "--carrier-window", "7-110", "--t0", "1500000000"]
        card_path = str(d / "rt.card")
        assert main(["capture", "--raw-in", raw_path, "-o", card_path,
                     "--quiet", "-k", "0"] + geom) == 0
        toad_raw, toad_card = str(d / "a.toad"), str(d / "b.toad")
        common = ["--quiet", "--template", tpl_path] + geom
        assert main(["detect", raw_path, "--raw",
                     "-o", toad_raw] + common) == 0
        assert main(["detect", card_path, "-o", toad_card] + common) == 0
        a, b = toad.load_toad(toad_raw), toad.load_toad(toad_card)
        assert len(a) == len(b) >= len(cap.bursts), \
            "bits=%d block=%d hist=%d" % (bits, block, hist)
        for f in a.dtype.names:
            np.testing.assert_array_equal(a[f], b[f], err_msg=f)


def test_record_cards_reports_counts_after_stream_error():
    """A dying stream must leave the shared stats reflecting what was
    flushed to the archive, so the at-exit summary does not claim
    'Read 0 blocks' over a non-empty .card file."""
    import io as io_mod

    import pytest

    from thrifty_tpu.pipeline.capture import record_cards

    B, NB = 4, 2 * 64  # batch, block bytes

    def gate(raw):
        n = len(raw)
        return (np.ones(n, bool), np.zeros(n, np.int64),
                np.ones(n), np.zeros(n), np.zeros(n))

    def batches():
        raw = np.full((B, NB), 128, np.uint8)
        yield np.arange(B, dtype=np.float64), np.arange(B), raw
        yield np.arange(B, dtype=np.float64) + B, np.arange(B) + B, raw
        raise IOError("stream died")

    out, stats = io_mod.StringIO(), {}
    with pytest.raises(IOError):
        record_cards(gate, batches(), B, out, stats=stats)
    assert stats["read"] == 2 * B
    assert stats["written"] == 2 * B
    assert out.getvalue().count("\n") == 2 * B


def test_capture_device_unfold_matches_host(raw_capture):
    """capture --device-unfold (on-device gate over the contiguous
    stream, host materializes only HIT rows) produces a byte-identical
    .card archive to the host-unfold path, including with skip and a
    deterministic t0 header."""
    from thrifty_tpu.cli import main

    cap, raw_path, _, tmp = raw_capture
    for skip in (0, 1):
        a_path = str(tmp / ("host%d.card" % skip))
        b_path = str(tmp / ("dev%d.card" % skip))
        common = ["--quiet", "--carrier-window", "7-110",
                  "-k", str(skip), "--t0", "1.5e9"]
        assert main(["capture", "--raw-in", raw_path,
                     "-o", a_path] + common) == 0
        assert main(["capture", "--raw-in", raw_path, "--device-unfold",
                     "-o", b_path] + common) == 0
        assert open(a_path).read() == open(b_path).read(), \
            "skip=%d" % skip


def test_gate_stream_history_exceeds_advance():
    """Geometries with history > advance (supported by the host pump)
    must also work through gate_stream via the gather fallback
    (review finding: the reshape unfold alone would crash)."""
    block, hist = 256, 160  # new = 96 < hist
    gate = capture.CarrierGate(block, (3, 12), (0.0, 15.0, 0.0),
                                   history_len=hist)
    new = block - hist
    rng = np.random.default_rng(5)
    stream = rng.integers(0, 256, size=2 * new * 8, dtype=np.uint8)
    det, amax, mag, noise, thr = (
        np.asarray(a) for a in gate.gate_stream(stream))
    assert det.shape == (8,)
    # Cross-check row 2 against a host-side unfold of the same stream.
    full = np.concatenate([np.full(2 * hist, 128, np.uint8), stream])
    row2 = full[2 * 2 * new: 2 * 2 * new + 2 * block]
    d2 = gate(row2[None, :])
    np.testing.assert_allclose(np.asarray(d2[2])[0], mag[2], rtol=1e-5)


def test_record_cards_flushes_in_flight_batch_on_interrupt():
    """SIGTERM (KeyboardInterrupt) is how every live run under a
    supervisor ends; the one batch kept in flight by design must still
    reach the archive before the exception surfaces."""
    import io as io_mod

    from thrifty_tpu.pipeline.capture import record_cards

    B, NB = 4, 2 * 64

    def gate(raw):
        n = len(raw)
        return (np.ones(n, bool), np.zeros(n, np.int64),
                np.ones(n), np.zeros(n), np.zeros(n))

    def batches():
        raw = np.full((B, NB), 128, np.uint8)
        yield np.arange(B, dtype=np.float64), np.arange(B), raw
        yield np.arange(B, dtype=np.float64) + B, np.arange(B) + B, raw
        raise KeyboardInterrupt

    out, stats = io_mod.StringIO(), {}
    with pytest.raises(KeyboardInterrupt):
        record_cards(gate, batches(), B, out, stats=stats)
    assert stats["written"] == 2 * B
    assert out.getvalue().count("\n") == 2 * B


def test_carrier_gate_keeps_ultra_strong_block():
    """A full-length pure carrier drives the noise-variance estimate
    negative; the gate must ARCHIVE it like fastcard (cardet.c keeps
    the signed power), not NaN-reject the strongest block like the
    reference Python."""
    n = 1024
    t = np.arange(n)
    x = 100.0 * np.exp(2j * np.pi * 40 * t / n)
    raw = iq.iq_to_raw(
        np.clip(x / np.max(np.abs(x)) * 0.99, -1, 1).astype(np.complex64)
    )[None, :]
    gate = capture.CarrierGate(n, (7, 110), (0.0, 15.0, 0.0))
    det, idx, mag, noise, thr = (np.asarray(a) for a in gate(raw))
    assert bool(det[0])
    assert int(idx[0]) == 40
    assert np.isfinite(float(thr[0]))


def test_gate_windowed_fast_path_equivalent():
    """CarrierGate's windowed-DFT fast path (fft_impl='matmul') must
    reproduce the full-FFT gate: identical verdicts and peak bins,
    magnitudes/noise/threshold to matmul accumulation tolerance, on a
    mix of burst and pure-noise blocks."""
    import numpy as np

    from thrifty_tpu import sim
    from thrifty_tpu.pipeline import capture

    tpl = sim.make_template()
    cap = sim.synth_capture(num_blocks=12, bursts_every=3,
                            template=tpl, seed=23)
    from thrifty_tpu.dsp import iq
    raw = iq.iq_to_raw(cap.blocks)

    full = capture.CarrierGate(16384, (7, 110), (0.0, 15.0, 0.0),
                               fft_impl="xla")
    fast = capture.CarrierGate(16384, (7, 110), (0.0, 15.0, 0.0),
                               fft_impl="matmul")
    assert fast._win is not None and full._win is None
    a = [np.asarray(x) for x in full(raw)]
    b = [np.asarray(x) for x in fast(raw)]
    np.testing.assert_array_equal(a[0], b[0])  # verdicts
    np.testing.assert_array_equal(a[1], b[1])  # peak bins
    for i in (2, 3, 4):  # magnitude, noise, threshold
        np.testing.assert_allclose(a[i], b[i], rtol=2e-5)


def test_gate_windowed_stddev_term_ineligible():
    """A stddev threshold term needs every bin's magnitude: the
    windowed path must not engage."""
    from thrifty_tpu.pipeline import capture

    g = capture.CarrierGate(16384, (7, 110), (0.0, 15.0, 2.0),
                            fft_impl="matmul")
    assert g._win is None


def test_gate_stream_windowed_equivalent():
    """gate_stream (device-side overlap-save) under the windowed-DFT
    fast path must match the full-FFT gate stream."""
    import numpy as np

    from thrifty_tpu import sim
    from thrifty_tpu.dsp import iq
    from thrifty_tpu.pipeline import capture

    tpl = sim.make_template()
    cap = sim.synth_capture(num_blocks=8, bursts_every=2,
                            template=tpl, seed=29)
    new = iq.iq_to_raw(cap.blocks[:, HISTORY:]).reshape(-1)
    outs = {}
    for impl in ("xla", "matmul"):
        g = capture.CarrierGate(16384, (7, 110), (0.0, 15.0, 0.0),
                                history_len=HISTORY, fft_impl=impl)
        outs[impl] = [np.asarray(x) for x in g.gate_stream(new)]
    a, b = outs["xla"], outs["matmul"]
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    for i in (2, 3, 4):
        np.testing.assert_allclose(a[i], b[i], rtol=2e-5)
