"""Incremental positioning server: live detections -> live fixes."""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import server as server_mod
from thrifty_tpu.pipeline import tdoa as tdoa_mod

FS = 2.4e6
RX_POS = {0: np.array([0.0, 0.0]), 1: np.array([10000.0, 0.0]),
          2: np.array([5000.0, 7000.0])}
BEACON_POS = {9: np.array([5000.0, 2000.0])}
MOBILE_POS = {3: np.array([7000.0, 1000.0])}


def scenario(duration=40.0):
    schedule = [(9, t) for t in np.arange(0.5, duration, 1.0)]
    schedule += [(3, t) for t in np.arange(4.0, duration - 2, 2.0)]
    det = sim.synth_network(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, schedule, FS,
        clock_offsets={1: 123.0, 2: -77.0},
        clock_drifts={1: 2e-6, 2: -1e-6},
        soa_noise=0.01)
    return det


# sim.synth_network stamps carrier_bin = 10 + 15*txid: map bins back to
# the canonical txids like a deployed freq-map.cfg would.
FREQMAP = {r: {9: (140.0, 150.0), 3: (50.0, 60.0)} for r in RX_POS}


class TestPositioningServer:
    def make_server(self, **kw):
        return server_mod.PositioningServer(
            rx_pos=RX_POS, beacon_pos=BEACON_POS, freqmap=FREQMAP,
            sample_rate=FS, match_window=0.2, tdoa_est_window=8.0,
            window_s=30.0, settle_s=1.0, **kw)

    def test_incremental_equals_batch(self):
        det = scenario()
        srv = self.make_server()
        # Feed detections in 5-second chunks, stepping after each.
        fixes = []
        for t0 in np.arange(0.0, 42.0, 5.0):
            chunk = det[(det["timestamp"] >= t0)
                        & (det["timestamp"] < t0 + 5.0)]
            srv.feed(chunk)
            fixes.append(srv.step(now=t0 + 5.0))
        all_fixes = np.concatenate(fixes)
        # Every mobile transmission inside the windows resolves once.
        assert len(all_fixes) >= 14
        assert len(np.unique(np.round(all_fixes["timestamp"], 1))) \
            == len(all_fixes)
        for row in all_fixes:
            est = np.array([row["x"], row["y"]])
            assert np.linalg.norm(est - MOBILE_POS[3]) < 30.0

    def run_fixes(self, det, chunks, incremental, duration=62.0,
                  **kw):
        srv = self.make_server(incremental=incremental, **kw)
        fixes = []
        for sel, now in chunks:
            srv.feed(det[sel])
            fixes.append(srv.step(now=now))
        return srv, np.concatenate(fixes)

    @staticmethod
    def assert_fix_sets_equal(a, b):
        key = lambda f: np.lexsort((f["tx"], f["timestamp"]))
        a, b = a[key(a)], b[key(b)]
        assert len(a) == len(b)
        for col in ("timestamp", "tx", "x", "y", "dop", "snr"):
            np.testing.assert_allclose(a[col], b[col], rtol=1e-9,
                                       atol=1e-9, err_msg=col)

    def test_frozen_prefix_equals_full_rescan(self):
        """incremental=True (frozen identify/match prefix) must emit
        exactly the fixes of the full-window rescan path."""
        det = scenario(duration=60.0)
        chunks = [((det["timestamp"] >= t0) & (det["timestamp"] < t0 + 5.0),
                   t0 + 5.0) for t0 in np.arange(0.0, 62.0, 5.0)]
        srv_inc, inc = self.run_fixes(det, chunks, True)
        srv_full, full = self.run_fixes(det, chunks, False)
        assert srv_inc.incremental and not srv_full.incremental
        assert len(srv_inc._frz_rows) > 0  # the freeze actually engaged
        self.assert_fix_sets_equal(inc, full)

    def test_late_arrival_unfreezes_exactly(self):
        """A receiver lagging behind the frozen horizon triggers the
        exact full-recompute path; outputs still match the rescan."""
        det = scenario(duration=60.0)
        order = np.argsort(det["timestamp"], kind="stable")
        det = det[order]
        late = det["rxid"] == 2  # rx 2 delivers everything 20 s late
        chunks = []
        for t0 in np.arange(0.0, 84.0, 4.0):
            sel = (~late & (det["timestamp"] >= t0)
                   & (det["timestamp"] < t0 + 4.0))
            sel |= (late & (det["timestamp"] >= t0 - 20.0)
                    & (det["timestamp"] < t0 - 16.0))
            chunks.append((sel, t0 + 4.0))
        srv_inc, inc = self.run_fixes(det, chunks, True)
        _, full = self.run_fixes(det, chunks, False)
        self.assert_fix_sets_equal(inc, full)

    def test_incremental_random_feed_order_fuzz(self):
        """Randomized chunking/ordering: frozen-prefix outputs equal
        the rescan across odd feed patterns (duplicate feeds of the
        same region are naturally absent -- receivers append)."""
        rng = np.random.default_rng(7)
        det = scenario(duration=50.0)
        for trial in range(3):
            jitter = rng.uniform(0, 3.0, size=len(det))
            arrival = det["timestamp"] + jitter  # per-record lag
            edges = np.arange(0.0, 56.0, float(rng.uniform(2.0, 6.0)))
            chunks = [((arrival >= a) & (arrival < b), b)
                      for a, b in zip(edges[:-1], edges[1:])]
            srv_inc, inc = self.run_fixes(det, chunks, True)
            _, full = self.run_fixes(det, chunks, False)
            self.assert_fix_sets_equal(inc, full)

    def test_frozen_prefix_keep_txid_equals_full_rescan(self):
        """keep_txid mode (txids from records, cross-tx dedup): the
        incremental path's GLOBAL context margin must keep outputs
        equal to the rescan."""
        det = scenario(duration=60.0)
        chunks = [((det["timestamp"] >= t0) & (det["timestamp"] < t0 + 5.0),
                   t0 + 5.0) for t0 in np.arange(0.0, 62.0, 5.0)]
        outs = {}
        for inc in (True, False):
            srv = server_mod.PositioningServer(
                rx_pos=RX_POS, beacon_pos=BEACON_POS, freqmap=None,
                sample_rate=FS, match_window=0.2, tdoa_est_window=8.0,
                window_s=30.0, settle_s=1.0, keep_txid=True,
                incremental=inc)
            assert srv.incremental == inc
            fixes = []
            for sel, now in chunks:
                srv.feed(det[sel])
                fixes.append(srv.step(now=now))
            outs[inc] = np.concatenate(fixes)
            if inc:
                assert len(srv._frz_rows) > 0
        self.assert_fix_sets_equal(outs[True], outs[False])

    def test_no_duplicate_fixes_on_repeat_step(self):
        det = scenario(duration=15.0)
        srv = self.make_server()
        srv.feed(det)
        first = srv.step()
        again = srv.step()
        assert len(first) > 0
        assert len(again) == 0

    def test_fast_transmitter_not_deduped(self):
        """Distinct transmissions just over match_window apart must each
        produce a fix (a quantized dedup key would suppress one)."""
        schedule = [(9, t) for t in np.arange(0.5, 12, 1.0)]
        schedule += [(3, 5.0), (3, 5.25), (3, 5.5), (3, 8.0)]
        det = sim.synth_network(
            RX_POS, {**BEACON_POS, **MOBILE_POS}, schedule, FS,
            soa_noise=0.01)
        srv = self.make_server()
        srv.feed(det)
        fixes = srv.step(now=12.0)
        mobile = fixes[fixes["tx"] == 3]
        assert len(mobile) == 4

    def test_unsettled_groups_deferred(self):
        det = scenario(duration=12.0)
        srv = self.make_server()
        srv.feed(det)
        now = float(np.max(det["timestamp"]))
        early = srv.step(now=now)
        # The most recent mobile transmission (within settle_s) waits.
        latest_fix = np.max(early["timestamp"]) if len(early) else 0
        assert latest_fix <= now - 1.0 + 0.2


class TestSoak:
    def test_hour_long_incremental_run(self):
        """An hour of traffic in 30 s steps: every transmission fixed
        exactly once, bounded memory, steady accuracy."""
        duration = 3600.0
        schedule = [(9, t) for t in np.arange(0.5, duration, 1.0)]
        mobile_times = np.arange(5.0, duration - 5, 7.0)
        schedule += [(3, t) for t in mobile_times]
        det = sim.synth_network(
            RX_POS, {**BEACON_POS, **MOBILE_POS}, schedule, FS,
            clock_offsets={1: 123.0, 2: -77.0},
            clock_drifts={1: 2e-6, 2: -1e-6},
            soa_noise=0.02)

        srv = server_mod.PositioningServer(
            rx_pos=RX_POS, beacon_pos=BEACON_POS, freqmap=FREQMAP,
            match_window=0.2, tdoa_est_window=8.0, window_s=30.0,
            settle_s=1.0)
        fixes = []
        for t0 in np.arange(0.0, duration + 10, 10.0):
            chunk = det[(det["timestamp"] >= t0)
                        & (det["timestamp"] < t0 + 10.0)]
            srv.feed(chunk)
            fixes.append(srv.step(now=min(t0 + 10.0, duration)))
        all_fixes = np.concatenate(fixes)

        # Exactly one fix per transmission.
        assert len(all_fixes) == len(mobile_times)
        assert len(np.unique(np.round(all_fixes["timestamp"], 1))) \
            == len(all_fixes)
        errs = np.hypot(all_fixes["x"] - MOBILE_POS[3][0],
                        all_fixes["y"] - MOBILE_POS[3][1])
        assert np.median(errs) < 15.0
        # Sliding window must have bounded the internal state.
        assert len(srv._detections) < 200
        assert sum(len(v) for v in srv._solved.values()) < 50


class TestToadTailer:
    def test_partial_lines_not_consumed(self, tmp_path):
        from thrifty_tpu.io import toad as toad_mod

        det = scenario(duration=3.0)
        line_full = server_mod.toad.format_line(det[0]) + "\n"
        line_partial = server_mod.toad.format_line(det[1])[:20]
        path = tmp_path / "rx.toad"
        path.write_text(line_full + line_partial)

        tailer = server_mod.ToadTailer([str(path)])
        first = tailer.poll()
        assert len(first) == 1  # only the complete line

        # Writer completes the partial line later.
        with open(path, "a") as f:
            f.write(server_mod.toad.format_line(det[1])[20:] + "\n")
        second = tailer.poll()
        assert len(second) == 1
        assert second[0]["soa"] == pytest.approx(det[1]["soa"])

    def test_rotation_same_size_detected(self, tmp_path):
        from thrifty_tpu.pipeline import server as sm

        det = scenario(duration=3.0)
        line = sm.toad.format_line(det[0]) + "\n"
        path = tmp_path / "rx.toad"
        path.write_text(line)
        tailer = sm.ToadTailer([str(path)])
        assert len(tailer.poll()) == 1
        # Rotate: replace with a NEW file (new inode) of equal content
        # plus one more line -- size >= old offset, so only the inode
        # check can catch it.
        tmp = tmp_path / "rx.toad.new"
        tmp.write_text(line + sm.toad.format_line(det[1]) + "\n")
        tmp.replace(path)
        got = tailer.poll()
        assert len(got) == 2  # reread from the top of the new file

    def test_no_newline_yet(self, tmp_path):
        path = tmp_path / "rx.toad"
        path.write_text("0 1.5")  # incomplete, no newline
        tailer = server_mod.ToadTailer([str(path)])
        assert len(tailer.poll()) == 0
        assert len(tailer.poll()) == 0


class TestServerCli:
    def test_tail_and_once(self, tmp_path):
        det = scenario(duration=20.0)
        # Split per receiver into .toad files (txid dropped: freqmap-free
        # auto classification happens in identify).
        for rxid in RX_POS:
            rx = det[det["rxid"] == rxid]
            toad.save(str(tmp_path / "rx{}.toad".format(rxid)), rx)
        (tmp_path / "pos-rx.cfg").write_text("".join(
            "{}: {} {}\n".format(r, p[0], p[1])
            for r, p in RX_POS.items()))
        (tmp_path / "pos-beacon.cfg").write_text("9: 5000.0 2000.0\n")
        (tmp_path / "freq-map.cfg").write_text(
            "9: 140 - 150\n3: 50 - 60\n@0: 0\n@1: 0\n@2: 0\n")
        out = str(tmp_path / "live.pos")
        rc = server_mod._main([
            str(tmp_path / "rx0.toad"), str(tmp_path / "rx1.toad"),
            str(tmp_path / "rx2.toad"),
            "-o", out,
            "-r", str(tmp_path / "pos-rx.cfg"),
            "-b", str(tmp_path / "pos-beacon.cfg"),
            "-m", str(tmp_path / "freq-map.cfg"),
            "--once"])
        assert rc is None
        lines = open(out).read().splitlines()
        assert len(lines) >= 5
        for line in lines:
            x, y = float(line.split()[5]), float(line.split()[6])
            assert np.linalg.norm(
                np.array([x, y]) - MOBILE_POS[3]) < 30.0


class TestFeedSanitization:
    """feed() rejects input that would crash or brick the live loop."""

    def make_server(self, **kw):
        return server_mod.PositioningServer(
            rx_pos=RX_POS, beacon_pos=BEACON_POS, freqmap=FREQMAP,
            sample_rate=FS, match_window=0.2, tdoa_est_window=8.0,
            window_s=30.0, settle_s=1.0, **kw)

    def test_unknown_receiver_detections_dropped(self, capsys):
        """A receiver missing from pos-rx.cfg must not KeyError-kill
        the server loop (tdoa geometry lookups); its detections are
        dropped with a warn-once."""
        det = scenario(duration=15.0)
        bad = det[:5].copy()
        bad["rxid"] = 7  # not in RX_POS
        srv = self.make_server()
        srv.feed(np.concatenate([det, bad]))
        fixes = srv.step()  # must not raise
        assert len(fixes) > 0
        assert capsys.readouterr().err.count("rx 7") == 1
        srv.feed(bad)
        srv.step()
        assert "rx 7" not in capsys.readouterr().err  # warn-once

    def test_far_future_timestamp_does_not_brick_window(self, capsys):
        """One clock-glitch detection at T+1e9 used to become "now",
        trim every legitimate detection out of the window, and keep
        doing so forever (it always survived its own trim)."""
        det = scenario(duration=15.0)
        glitch = det[:1].copy()
        glitch["timestamp"] = det["timestamp"].max() + 1e9
        srv = self.make_server(clock=lambda: 20.0)
        srv.feed(np.concatenate([det, glitch]))
        fixes = srv.step()
        assert len(fixes) > 0  # the window survived
        assert "future" in capsys.readouterr().err
        # The glitch record itself was rejected, not retained.
        assert float(np.max(srv._detections["timestamp"])) < 1e6

    def test_historical_replay_unaffected(self):
        """--once on old files: timestamps far in the PAST are fine."""
        det = scenario(duration=15.0)
        srv = self.make_server(clock=lambda: 1.8e9)
        srv.feed(det)
        assert len(srv.step()) > 0
