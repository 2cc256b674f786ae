"""Incremental positioning server: live detections -> live position fixes.

The reference pipeline is batch-only (files in, files out).  For
production serving, this module processes detections *incrementally*:
feed it detection records as receivers produce them (tailing .toad
files, a socket, or in-process), and it periodically re-runs
identify -> match -> tdoa -> pos over a sliding time window, emitting
only fixes for newly completed match groups.

The CLI tails per-receiver .toad files (the natural transport -- the
reference ships the same files by scp/NFS) and appends fixes to a .pos
file as they resolve.
"""

from __future__ import annotations

import argparse
import functools
import io
import sys
import time as time_mod

import numpy as np

from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import identify as identify_mod
from thrifty_tpu.pipeline import matchmaker as matchmaker_mod
from thrifty_tpu.pipeline import pos as pos_mod
from thrifty_tpu.pipeline import tdoa as tdoa_mod


class PositioningServer:
    """Sliding-window incremental positioning.

    Parameters mirror kitchen_sink.PostdetectSettings; additionally:

    window_s : float
        Sliding history length.  Must comfortably exceed the TDOA
        beacon window so clock models stay well-conditioned.
    settle_s : float
        A match group is only solved once it is at least this old
        (receivers may still deliver detections for it).

    step() must be called at intervals shorter than
    ``window_s - settle_s``: a settle-deferred group needs at least one
    later step before it scrolls out of the sliding window.

    future_tol_s : float
        feed() rejects detections stamped more than this far ahead of
        the server's own clock.  Receivers are NTP-disciplined to the
        same timebase (the reference's matching precondition,
        rpi/detect.sh:17-18), so a far-future timestamp is a clock
        glitch or a corrupt line -- and because step() derives "now"
        from the max timestamp, one such record would otherwise trim
        every legitimate detection out of the sliding window forever.
        Historical replays (timestamps in the past) are unaffected.
    clock : callable
        Time source for the future check (default time.time);
        injectable for tests.
    """

    def __init__(self, rx_pos, beacon_pos, freqmap=None,
                 sample_rate=2.4e6, match_window=0.2,
                 tdoa_est_window=8.0, window_s=30.0, settle_s=1.0,
                 keep_txid=False, solver="auto", future_tol_s=300.0,
                 clock=None):
        self.rx_pos = rx_pos
        self.beacon_pos = beacon_pos
        self.freqmap = freqmap
        self.sample_rate = sample_rate
        self.match_window = match_window
        self.tdoa_est_window = tdoa_est_window
        self.window_s = window_s
        self.settle_s = settle_s
        self.keep_txid = keep_txid
        # 'scipy' solves each group with the trust-region solver;
        # 'batched' (and 'auto', its alias since the multi-start
        # upgrade) uses the batched multi-start Gauss-Newton program:
        # one dispatch per step regardless of load, and robust to the
        # mirror basins of near-collinear arrays that trap any
        # single-start solver (docs/design.md).
        if solver not in ("auto", "scipy", "batched"):
            raise ValueError("unknown solver: " + solver)
        self.solver = solver
        self.future_tol_s = future_tol_s
        self._clock = clock if clock is not None else time_mod.time
        self._rx_ids = np.array(sorted(rx_pos), dtype=np.int64)
        self._beacon_ids = np.array(sorted(beacon_pos), dtype=np.int64)
        # Warn-once set for unmapped receivers (step() runs every poll).
        self._warned_rx = set()
        # Warn-once sets for feed()-time rejections.
        self._warned_unknown_rx = set()
        self._warned_future_rx = set()
        self._detections = toad.empty(0)
        # Solved transmissions per txid as sorted timestamp lists: a
        # group is a duplicate iff a solved fix for its transmitter lies
        # within match_window (exact, no quantization-boundary artifacts
        # and no suppression of distinct transmissions).
        self._solved = {}  # txid -> sorted [timestamps]

    def feed(self, detections):
        """Add new detection records (any order, any receiver).

        Records from receivers absent from the coordinate config are
        dropped (they can never contribute to a clock model or a TDOA
        pair, and would crash the geometry lookups downstream), as are
        far-future timestamps (see ``future_tol_s``); both warn once
        per receiver.
        """
        if not len(detections):
            return

        def drop(keep, warned, message):
            for r in set(int(r) for r in detections["rxid"][~keep]):
                if r not in warned:
                    warned.add(r)
                    print("warning: dropping detection(s) from rx {} "
                          "{}".format(r, message), file=sys.stderr)
            return detections[keep]

        known = np.isin(detections["rxid"], self._rx_ids)
        if not known.all():
            detections = drop(known, self._warned_unknown_rx,
                              "(not in receiver coordinate config)")
        sane = detections["timestamp"] \
            <= self._clock() + self.future_tol_s
        if not sane.all():
            detections = drop(sane, self._warned_future_rx,
                              "stamped >{:.0f}s in the future (clock "
                              "glitch or corrupt line?)".format(
                                  self.future_tol_s))
        if len(detections):
            self._detections = np.concatenate(
                [self._detections, detections])

    def _is_solved(self, timestamp, tx):
        times = self._solved.get(int(tx))
        if not times:
            return False
        import bisect
        i = bisect.bisect_left(times, timestamp - self.match_window)
        return i < len(times) and \
            times[i] <= timestamp + self.match_window

    def _mark_solved(self, timestamp, tx):
        import bisect
        times = self._solved.setdefault(int(tx), [])
        bisect.insort(times, float(timestamp))

    def step(self, now=None):
        """Process the current window; return newly solved fixes."""
        if len(self._detections) == 0:
            return pos_mod.solve([], self.rx_pos)
        if now is None:
            now = float(np.max(self._detections["timestamp"]))

        # Trim the sliding window.
        keep = self._detections["timestamp"] >= now - self.window_s
        self._detections = self._detections[keep]
        dets = self._detections.copy()

        integrated = identify_mod.integrate(
            dets, self.freqmap, keep_txid=self.keep_txid,
            dedup_any_tx=self.keep_txid, warned=self._warned_rx)
        arr = matchmaker_mod.match_detections_arrays(
            integrated, self.match_window)
        seeds, off, flat = arr["seeds"], arr["offsets"], arr["winners"]
        cnt = np.diff(off)

        # Estimate TDOAs only for settled, not-yet-reported mobile
        # groups (beacon groups always flow to the clock models): a
        # late detection can move the group's seed timestamp by up to
        # match_window, so the duplicate check is a +-match_window
        # interval, not a key.  Filtering BEFORE estimation keeps the
        # per-step cost proportional to new traffic, not window size --
        # and the selection itself is vectorized over the array-native
        # matcher output, so the per-step Python work is proportional
        # to groups SELECTED, not groups in the window (the previous
        # per-group loop was a measured hot spot at 50x density).
        seed_tx = integrated["txid"][seeds]
        seed_ts = integrated["timestamp"][seeds]
        enough = cnt >= 2  # the matcher's min_match
        is_beacon = np.isin(seed_tx, self._beacon_ids)
        unsolved = np.ones(len(seeds), dtype=bool)
        mobile = enough & ~is_beacon
        for t in np.unique(seed_tx[mobile]):
            times = self._solved.get(int(t))
            if not times:
                continue
            sel = mobile & (seed_tx == t)
            tsv = seed_ts[sel]
            tarr = np.asarray(times)
            i = np.searchsorted(tarr, tsv - self.match_window)
            hit = (i < len(tarr)) & (
                tarr[np.minimum(i, len(tarr) - 1)]
                <= tsv + self.match_window)
            unsolved[sel] = ~hit
        settled = seed_ts <= now - self.settle_s
        work_mask = (enough & is_beacon) | (mobile & settled & unsolved)
        work = [flat[off[g]:off[g + 1]]
                for g in np.nonzero(work_mask)[0]]
        fresh, _ = tdoa_mod.estimate_tdoas(
            integrated, work, self.tdoa_est_window,
            self.beacon_pos, self.rx_pos, self.sample_rate)

        # verbose=False: an underdetermined group here is a normal
        # transient (a lagging receiver may still complete it); it is
        # retried every step and would re-print the same line ~30
        # times per group at production poll rates.
        use_batched = self.solver != "scipy"
        if use_batched:
            results = pos_mod.solve_batched(fresh, self.rx_pos,
                                            verbose=False)
        else:
            results = pos_mod.solve(fresh, self.rx_pos, verbose=False)
        # Mark solved only what actually produced a fix: a group that
        # failed (e.g. underdetermined until a lagging receiver's
        # detections arrive) is retried on later steps.
        solved_ids = set(int(i) for i in results["group_id"]) \
            if len(results) else set()
        for g in fresh:
            if g.group_id in solved_ids:
                self._mark_solved(g.timestamp, g.tx)
        # Prune entries that scrolled out of the sliding window (a
        # long-running server would otherwise leak them forever).
        horizon = now - self.window_s - 10 * self.match_window
        self._solved = {
            tx: [t for t in times if t >= horizon]
            for tx, times in self._solved.items()
        }
        return results


class ToadTailer:
    """Incrementally read appended lines from per-receiver .toad files.

    Only complete lines are consumed: a partially written trailing line
    (writers are not line-atomic) stays for the next poll.
    """

    def __init__(self, paths):
        self._paths = list(paths)
        self._offsets = {p: 0 for p in self._paths}
        self._inodes = {}

    def poll(self):
        import os

        parts = []
        for path in self._paths:
            try:
                with open(path, "rb") as f:
                    st = os.fstat(f.fileno())
                    if (st.st_ino != self._inodes.get(path, st.st_ino)
                            or st.st_size < self._offsets[path]):
                        # Truncated or rotated (new inode, or shrunk):
                        # start over from the top of the new file.
                        self._offsets[path] = 0
                    self._inodes[path] = st.st_ino
                    f.seek(self._offsets[path])
                    data = f.read()
            except FileNotFoundError:
                continue
            # Consume up to (and including) the last newline only.
            cut = data.rfind(b"\n") + 1
            if cut == 0:
                continue
            self._offsets[path] += cut
            text = data[:cut].decode("ascii", errors="replace")
            parts.append(toad.load_toad(io.StringIO(text)))
        if not parts:
            return toad.empty(0)
        return np.concatenate(parts)


def _main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("toad_files", nargs="+",
                        help="per-receiver .toad files to tail")
    parser.add_argument("-o", "--output", type=str, default="live.pos")
    parser.add_argument("-r", "--rx-coordinates", dest="rx_pos",
                        type=str, default="pos-rx.cfg")
    parser.add_argument("-b", "--beacon-coordinates", dest="beacon_pos",
                        type=str, default="pos-beacon.cfg")
    parser.add_argument("-m", "--map", type=argparse.FileType("r"),
                        default=None, help="frequency map for txids")
    parser.add_argument("--interval", type=float, default=1.0,
                        help="poll interval in seconds")
    parser.add_argument("--match-window", type=float, default=0.2)
    parser.add_argument("--tdoa-window", type=float, default=8.0)
    parser.add_argument("--history", type=float, default=30.0,
                        help="sliding window length (s)")
    parser.add_argument("--once", action="store_true",
                        help="process what is on disk and exit "
                             "(for testing/batch use)")
    parser.add_argument("--track", type=str, default=None, metavar="FILE",
                        help="also Kalman-track fixes into FILE")
    parser.add_argument("--solver", type=str, default="auto",
                        choices=["auto", "scipy", "batched"],
                        help="position solver: the batched multi-start "
                             "Gauss-Newton program by default ('auto' "
                             "== 'batched'); 'scipy' forces the "
                             "per-group trust-region solver "
                             "[default: auto]")
    args = parser.parse_args(argv)

    if args.interval >= args.history - 1.0:
        parser.error(
            "--interval must be well below --history (a settle-deferred "
            "group needs a later poll before it leaves the window)")

    server = PositioningServer(
        rx_pos=tdoa_mod.load_pos_config(args.rx_pos),
        beacon_pos=tdoa_mod.load_pos_config(args.beacon_pos),
        freqmap=identify_mod.load_freqmap(args.map),
        match_window=args.match_window,
        tdoa_est_window=args.tdoa_window,
        window_s=args.history,
        settle_s=0.0 if args.once else 1.0,
        solver=args.solver)
    tailer = ToadTailer(args.toad_files)

    trackers = {}
    track_out = open(args.track, "a") if args.track else None
    out = open(args.output, "a")
    try:
        while True:
            server.feed(tailer.poll())
            fixes = server.step()
            if len(fixes):
                pos_mod.save_positions(out, fixes)
                out.flush()
                for row in fixes:
                    print("fix: t={:.3f} tx={} pos=({:.1f}, {:.1f}) "
                          "dop={:.2f}".format(
                              row["timestamp"], row["tx"], row["x"],
                              row["y"], row["dop"]), file=sys.stderr)
                if track_out is not None:
                    from thrifty_tpu.pipeline import track as track_mod
                    for line in track_mod.live_update(trackers, fixes):
                        track_out.write(line + "\n")
                    track_out.flush()
            if args.once:
                break
            time_mod.sleep(args.interval)
    except KeyboardInterrupt:
        pass
    finally:
        out.close()
        if track_out is not None:
            track_out.close()


if __name__ == "__main__":
    sys.exit(_main())
