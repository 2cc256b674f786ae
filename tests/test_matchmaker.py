import io

import numpy as np

from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import matchmaker


def make(rows):
    """rows: (rxid, txid, timestamp, energy)."""
    det = toad.empty(len(rows))
    for i, (rxid, txid, ts, energy) in enumerate(rows):
        det[i]["rxid"], det[i]["txid"] = rxid, txid
        det[i]["timestamp"], det[i]["energy"] = ts, energy
    return det


class TestMatch:
    def test_basic_two_rx_match(self):
        det = make([
            (0, 1, 10.00, 5.0),
            (1, 1, 10.05, 5.0),   # same tx, within window
            (0, 1, 20.00, 5.0),   # lone detection -> miss
        ])
        matches, misses, collisions = matchmaker.match_detections(det)
        assert matches == [[0, 1]]
        assert misses == [2]
        assert collisions == []

    def test_window_excludes_far_detections(self):
        det = make([
            (0, 1, 10.0, 5.0),
            (1, 1, 10.5, 5.0),   # outside 0.2 s window
        ])
        matches, misses, _ = matchmaker.match_detections(det, window=0.2)
        assert matches == []
        assert sorted(misses) == [0, 1]

    def test_different_tx_not_matched(self):
        det = make([
            (0, 1, 10.0, 5.0),
            (1, 2, 10.01, 5.0),
        ])
        matches, misses, _ = matchmaker.match_detections(det)
        assert matches == []

    def test_collision_resolved_by_energy(self):
        det = make([
            (0, 1, 10.00, 5.0),
            (1, 1, 10.01, 3.0),   # rx1 weak
            (1, 1, 10.02, 9.0),   # rx1 strong -> wins
        ])
        matches, _, collisions = matchmaker.match_detections(det)
        assert len(matches) == 1
        assert sorted(matches[0]) == [0, 2]
        assert collisions == [(1, 2)]

    def test_collision_keeps_earlier_stronger(self):
        det = make([
            (0, 1, 10.00, 5.0),
            (1, 1, 10.01, 9.0),
            (1, 1, 10.02, 3.0),
        ])
        matches, _, collisions = matchmaker.match_detections(det)
        assert sorted(matches[0]) == [0, 1]

    def test_min_match_three(self):
        det = make([
            (0, 1, 10.00, 5.0),
            (1, 1, 10.01, 5.0),
            (2, 1, 10.02, 5.0),
        ])
        m3, _, _ = matchmaker.match_detections(det, min_match=3)
        assert len(m3) == 1 and sorted(m3[0]) == [0, 1, 2]
        det2 = make([(0, 1, 10.00, 5.0), (1, 1, 10.01, 5.0)])
        m3b, misses, _ = matchmaker.match_detections(det2, min_match=3)
        assert m3b == [] and misses == [0]


class TestBatchedEquivalence:
    """match_detections_batched must reproduce the greedy scan exactly."""

    CASES = [
        dict(n=0, seed=0),
        dict(n=1, seed=1),
        dict(n=400, seed=2, ntx=3, nrx=4, span=20.0),
        # Dense: many collisions and window overlaps.
        dict(n=600, seed=3, ntx=2, nrx=2, span=4.0),
        # Sparse: mostly misses.
        dict(n=200, seed=4, ntx=5, nrx=6, span=500.0),
        # Heavy ties: quantized timestamps and energies.
        dict(n=500, seed=5, ntx=2, nrx=3, span=10.0, quantize=True),
        # Pathological self-collision: one tx, few rx, everything in a
        # couple of windows -> long incumbent chains with energy ties
        # (exercises the segmented running-argmax collision path).
        dict(n=800, seed=6, ntx=1, nrx=2, span=2.0, quantize=True),
    ]

    def _fuzz(self, n, seed, ntx=3, nrx=4, span=20.0, quantize=False):
        rng = np.random.default_rng(seed)
        det = toad.empty(n)
        ts = np.sort(rng.uniform(0.0, span, n))
        energy = rng.uniform(1.0, 10.0, n)
        if quantize:
            ts = np.round(ts, 1)
            energy = np.round(energy)
        det["timestamp"] = ts
        det["energy"] = energy
        det["txid"] = rng.integers(0, ntx, n)
        det["rxid"] = rng.integers(0, nrx, n)
        return det

    def test_fuzz_identical(self):
        for case in self.CASES:
            det = self._fuzz(**case)
            for window, min_match in [(0.2, 2), (0.05, 2), (1.0, 3)]:
                ref = matchmaker.match_detections(det, window, min_match)
                got = matchmaker.match_detections_batched(
                    det, window, min_match)
                assert got == ref, (case, window, min_match)

    def test_nan_energy_never_wins_and_paths_agree(self):
        """Corrupt rows with non-finite energy sanitize to -inf in BOTH
        paths: they never win a collision, the winner stays the best
        finite detection, and sequential == batched (a NaN used to
        poison the batched running max, electing a detection from an
        unrelated group as winner)."""
        for bad in (np.nan, np.inf, -np.inf):
            det = toad.empty(6)
            det["timestamp"] = [0.0, 0.01, 0.02, 0.03, 5.0, 5.01]
            det["txid"] = [1, 1, 1, 1, 1, 1]
            det["rxid"] = [0, 0, 0, 1, 0, 1]
            det["energy"] = [5.0, bad, 3.0, 2.0, 9.0, 1.0]
            ref = matchmaker.match_detections(det, 0.2, 2)
            got = matchmaker.match_detections_batched(det, 0.2, 2)
            assert got == ref, bad
            matches = got[0]
            # Group 1 (rows 0-3): rx0's winner is row 0 (energy 5.0),
            # never the corrupt row 1 and never a row from group 2.
            assert sorted(matches[0]) == [0, 3]
            assert sorted(matches[1]) == [4, 5]

    def test_all_nonfinite_run_keeps_last(self):
        """An all-corrupt run still produces exactly one winner (the
        last in scan order -- ties replace), identically in both
        paths."""
        det = toad.empty(3)
        det["timestamp"] = [0.0, 0.01, 0.02]
        det["txid"] = [1, 1, 1]
        det["rxid"] = [0, 0, 1]
        det["energy"] = [np.nan, np.nan, 4.0]
        ref = matchmaker.match_detections(det, 0.2, 2)
        got = matchmaker.match_detections_batched(det, 0.2, 2)
        assert got == ref
        assert sorted(got[0][0]) == [1, 2]

    def test_negative_window_terminates_like_sequential(self):
        # window < 0 makes the searchsorted jump table point backwards;
        # the batched seed walk must still terminate and agree with the
        # sequential scan (whose inner range is empty: every detection
        # seeds its own group -> all misses).
        det = make([
            (0, 1, 10.00, 5.0),
            (1, 1, 10.01, 3.0),
            (0, 1, 10.02, 4.0),
        ])
        ref = matchmaker.match_detections(det, window=-0.1)
        got = matchmaker.match_detections_batched(det, window=-0.1)
        assert got == ref
        assert ref == ([], [0, 1, 2], [])

    def test_collision_order_and_pairs(self):
        # Interleaved rx collisions inside one group: pair order must
        # follow the scan (j ascending), with the running best as prev.
        det = make([
            (0, 1, 10.00, 5.0),
            (1, 1, 10.01, 3.0),
            (0, 1, 10.02, 5.0),   # tie with 0 -> replaces (not >)
            (1, 1, 10.03, 9.0),
            (0, 1, 10.04, 1.0),
        ])
        ref = matchmaker.match_detections(det)
        got = matchmaker.match_detections_batched(det)
        assert got == ref
        assert got[2] == [(0, 2), (1, 3), (2, 4)]
        assert got[0] == [[2, 3]]


class TestIO:
    def test_round_trip(self):
        matches = [[0, 1], [2, 3, 4]]
        buf = io.StringIO()
        matchmaker.save_matches(buf, matches)
        buf.seek(0)
        assert matchmaker.load_matches(buf) == matches


class TestMatrix:
    def test_extracts_full_coverage_rows(self):
        det = make([
            (0, 1, 10.00, 5.0), (1, 1, 10.01, 5.0),
            (0, 1, 20.00, 5.0),  # only rx0
            (0, 2, 30.00, 5.0), (1, 2, 30.01, 5.0),
        ])
        matches = [[0, 1], [2], [3, 4]]
        rows = matchmaker.match_matrix(det, matches, rxids=[0, 1])
        assert rows == [[0, 1], [3, 4]]
        rows_tx = matchmaker.match_matrix(det, matches, rxids=[0, 1],
                                          txids=[2])
        assert rows_tx == [[3, 4]]
