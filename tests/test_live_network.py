"""LIVE deployment integration: three rtl_tcp radios -> three
concurrent ``detect --rtl-tcp`` nodes -> identify -> match -> tdoa ->
pos, positions checked against the simulated geometry.

This is the system test of the deployment story the reference runs as
rpi/detect.sh per receiver + a central server (README.rst:52-64):
every receiver node ingests a live network SDR stream concurrently in
one process-pool-free world (three pumps + three detector loops share
one jitted program), and the merged chain recovers the mobile
transmitter's position.  Uses --t0 on every node so receiver
timestamps are coherent the same way NTP coarse-aligns them in the
field (SURVEY.md section 2.4 item 5).
"""

import threading

import numpy as np
import pytest

from test_rtl_tcp import FakeRtlTcpServer

from thrifty_tpu import sim
from thrifty_tpu.cli import main
from thrifty_tpu.dsp import iq

HISTORY = 4920
FS = 2.4e6

RX_POS = {0: np.array([0.0, 0.0]),
          1: np.array([9000.0, 500.0]),
          2: np.array([4000.0, 8000.0])}
BEACON_POS = {9: np.array([4500.0, 3000.0])}
MOBILE_POS = {3: np.array([6000.0, 2500.0])}


@pytest.fixture(scope="module")
def live_toads(tmp_path_factory):
    d = tmp_path_factory.mktemp("live_network")
    tpl = sim.make_template()
    np.save(str(d / "template.npy"), tpl)
    schedule = [(9, t) for t in np.arange(0.02, 0.36, 0.05)]
    schedule += [(3, t) for t in (0.085, 0.185, 0.285)]
    caps = sim.synth_rx_captures(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, {9: 30, 3: 70}, schedule,
        template=tpl, num_blocks=80, amplitude=0.6, noise_std=0.04,
        clock_offsets={1: 777.25, 2: -123.5},
        clock_drifts={1: 3e-6, 2: -2e-6}, seed=11)

    servers = {
        rxid: FakeRtlTcpServer(payload=iq.iq_to_raw(
            cap.blocks[:, HISTORY:].reshape(-1)).tobytes())
        for rxid, cap in caps.items()
    }

    rcs = {}

    def node(rxid):
        rcs[rxid] = main([
            "detect", "--rtl-tcp",
            "127.0.0.1:%d" % servers[rxid].port,
            "--rxid", str(rxid), "--t0", "1.5e9", "--quiet",
            "--template", str(d / "template.npy"),
            "--carrier-window", "7-110",
            "-o", str(d / ("rx%d.toad" % rxid))])

    threads = [threading.Thread(target=node, args=(rxid,))
               for rxid in RX_POS]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for srv in servers.values():
        srv.join()
    assert rcs == {0: 0, 1: 0, 2: 0}, rcs

    (d / "freq-map.cfg").write_text(
        "9: 25 - 35\n3: 65 - 75\n@0: 0\n@1: 0\n@2: 0\n")
    (d / "pos-rx.cfg").write_text("".join(
        "{}: {} {}\n".format(r, p[0], p[1]) for r, p in RX_POS.items()))
    (d / "pos-beacon.cfg").write_text("".join(
        "{}: {} {}\n".format(t, p[0], p[1])
        for t, p in BEACON_POS.items()))
    return d, caps


def test_live_nodes_detect_everything(live_toads):
    d, caps = live_toads
    for rxid in RX_POS:
        rows = (d / ("rx%d.toad" % rxid)).read_text().splitlines()
        assert len(rows) >= 10, "rx%d: %d detections" % (rxid, len(rows))


def test_live_equals_offline(live_toads, tmp_path):
    """A live node's output is bit-identical to detecting the same
    stream offline from a file (concurrency changes nothing)."""
    d, caps = live_toads
    raw = tmp_path / "rx0.bin"
    raw.write_bytes(iq.iq_to_raw(
        caps[0].blocks[:, HISTORY:].reshape(-1)).tobytes())
    assert main(["detect", str(raw), "--raw", "--rxid", "0",
                 "--t0", "1.5e9", "--quiet",
                 "--template", str(d / "template.npy"),
                 "--carrier-window", "7-110",
                 "-o", str(tmp_path / "rx0.toad")]) == 0
    assert (tmp_path / "rx0.toad").read_text() == \
        (d / "rx0.toad").read_text()


def test_live_chain_recovers_position(live_toads):
    d, caps = live_toads
    toads = [str(d / ("rx%d.toad" % r)) for r in RX_POS]
    assert main(["identify"] + toads +
                ["-o", str(d / "rx.toads"),
                 "-m", str(d / "freq-map.cfg")]) == 0
    assert main(["match", str(d / "rx.toads"),
                 "-o", str(d / "rx.match"), "-w", "0.02"]) == 0
    assert main(["tdoa", str(d / "rx.toads"), str(d / "rx.match"),
                 "-o", str(d / "data.tdoa"),
                 "-r", str(d / "pos-rx.cfg"),
                 "-b", str(d / "pos-beacon.cfg")]) == 0
    assert main(["pos", str(d / "data.tdoa"),
                 "-o", str(d / "data.pos"),
                 "-r", str(d / "pos-rx.cfg")]) == 0
    rows = (d / "data.pos").read_text().splitlines()
    assert len(rows) == 3
    for row in rows:
        f = row.split()
        est = np.array([float(f[5]), float(f[6])])
        assert np.linalg.norm(est - MOBILE_POS[3]) < 60.0, est


def test_tailer_reads_concurrently_with_live_writers(tmp_path):
    """The serve transport under real concurrency: ToadTailer polls
    per-receiver .toad files WHILE live detect nodes append to them.
    Every record must arrive exactly once, uncorrupted (the tailer
    must never consume a partially written line), and feeding the
    incrementally collected records to the positioning server yields
    the same fixes as the complete files."""
    import time

    from thrifty_tpu.io import toad
    from thrifty_tpu.pipeline import server as server_mod

    tpl = sim.make_template()
    np.save(str(tmp_path / "template.npy"), tpl)
    schedule = [(9, t) for t in np.arange(0.02, 0.36, 0.05)]
    schedule += [(3, t) for t in (0.085, 0.185, 0.285)]
    caps = sim.synth_rx_captures(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, {9: 30, 3: 70}, schedule,
        template=tpl, num_blocks=80, amplitude=0.6, noise_std=0.04,
        clock_offsets={1: 777.25, 2: -123.5},
        clock_drifts={1: 3e-6, 2: -2e-6}, seed=11)
    servers = {
        rxid: FakeRtlTcpServer(payload=iq.iq_to_raw(
            cap.blocks[:, HISTORY:].reshape(-1)).tobytes())
        for rxid, cap in caps.items()
    }
    paths = {r: str(tmp_path / ("rx%d.toad" % r)) for r in RX_POS}
    for p in paths.values():
        open(p, "w").close()  # tailer needs the files to exist

    def node(rxid):
        main(["detect", "--rtl-tcp",
              "127.0.0.1:%d" % servers[rxid].port,
              "--rxid", str(rxid), "--t0", "1.5e9", "--quiet",
              "--template", str(tmp_path / "template.npy"),
              "--carrier-window", "7-110", "-o", paths[rxid]])

    threads = [threading.Thread(target=node, args=(r,)) for r in RX_POS]
    for t in threads:
        t.start()

    tailer = server_mod.ToadTailer(list(paths.values()))
    collected = []
    while any(t.is_alive() for t in threads):
        got = tailer.poll()
        if len(got):
            collected.append(got)
        time.sleep(0.05)
    for t in threads:
        t.join(timeout=60)
    for srv in servers.values():
        srv.join()
    got = tailer.poll()
    if len(got):
        collected.append(got)
    live = np.concatenate(collected)

    whole = np.concatenate([toad.load_toad(p) for p in paths.values()])
    assert len(live) == len(whole) > 0
    # Same record multiset (order differs by arrival), none corrupted.
    key = np.lexsort((live["soa"], live["rxid"]))
    key2 = np.lexsort((whole["soa"], whole["rxid"]))
    for col in ("rxid", "block", "soa", "energy"):
        np.testing.assert_array_equal(live[key][col], whole[key2][col])
