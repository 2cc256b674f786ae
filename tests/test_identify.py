import io

import numpy as np

from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import identify


def make_detections(rows):
    """rows: (rxid, txid, timestamp, block, carrier_bin, energy)."""
    det = toad.empty(len(rows))
    for i, (rxid, txid, ts, block, cbin, energy) in enumerate(rows):
        det[i]["rxid"] = rxid
        det[i]["txid"] = txid
        det[i]["timestamp"] = ts
        det[i]["block"] = block
        det[i]["carrier_bin"] = cbin
        det[i]["energy"] = energy
    return det


class TestWindows:
    def test_two_transmitters(self):
        rng = np.random.default_rng(0)
        freqs = np.concatenate([
            rng.integers(20, 23, 200),   # TX around bin 20-22
            rng.integers(50, 54, 180),   # TX around bin 50-53
        ])
        edges = identify.detect_transmitter_windows(freqs)
        assert len(edges) == 3  # two windows
        assert edges[0] == 20
        assert 23 <= edges[1] <= 50
        assert edges[-1] >= 54

    def test_auto_classify(self):
        rng = np.random.default_rng(1)
        rows = []
        for _ in range(100):
            rows.append((0, -1, 0.0, 0, int(rng.integers(20, 23)), 1.0))
        for _ in range(100):
            rows.append((0, -1, 0.0, 0, int(rng.integers(50, 54)), 1.0))
        det = make_detections(rows)
        txids = identify.auto_classify(det)
        assert set(txids[:100]) == {0}
        assert set(txids[100:]) == {1}


class TestFreqmap:
    FREQMAP = "0: 4 - 17\n1: 32 - 48\n@0: +7\n@1: 0\n"

    def test_load(self):
        fm = identify.load_freqmap(io.StringIO(self.FREQMAP))
        assert fm[0][0] == (11.0, 24.0)  # +7 offset for rx 0
        assert fm[1][0] == (4.0, 17.0)
        assert fm[1][1] == (32.0, 48.0)

    def test_classify(self):
        fm = identify.load_freqmap(io.StringIO(self.FREQMAP))
        det = make_detections([
            (0, -1, 0.0, 0, 12, 1.0),   # rx0: in tx0's shifted window
            (1, -1, 0.0, 0, 12, 1.0),   # rx1: in tx0's window
            (1, -1, 0.0, 0, 40, 1.0),   # rx1: tx1
            (1, -1, 0.0, 0, 99, 1.0),   # nothing
        ])
        txids = identify.classify_by_freqmap(det, fm)
        assert txids.tolist() == [0, 0, 1, identify.UNIDENTIFIED]


class TestDuplicates:
    def test_adjacent_block_weaker_removed(self):
        det = make_detections([
            (0, 1, 10.0, 100, 40, 50.0),   # strong
            (0, 1, 10.1, 101, 40, 10.0),   # weaker duplicate, next block
            (0, 1, 20.0, 200, 40, 30.0),   # unrelated later detection
        ])
        mask = identify.duplicate_mask(det)
        assert mask.tolist() == [True, False, True]

    def test_stronger_in_next_block_wins(self):
        det = make_detections([
            (0, 1, 10.0, 100, 40, 10.0),
            (0, 1, 10.1, 101, 40, 50.0),
        ])
        mask = identify.duplicate_mask(det)
        assert mask.tolist() == [False, True]

    def test_different_tx_not_duplicates(self):
        det = make_detections([
            (0, 1, 10.0, 100, 40, 50.0),
            (0, 2, 10.1, 101, 70, 10.0),
        ])
        mask = identify.duplicate_mask(det)
        assert mask.tolist() == [True, True]

    def test_different_rx_not_duplicates(self):
        det = make_detections([
            (0, 1, 10.0, 100, 40, 50.0),
            (1, 1, 10.1, 101, 40, 10.0),
        ])
        mask = identify.duplicate_mask(det)
        assert mask.tolist() == [True, True]

    def test_cross_txid_duplicate_kept_by_default(self):
        det = make_detections([
            (0, 1, 10.0, 100, 40, 50.0),
            (0, 2, 10.1, 101, 40, 10.0),  # misidentified weak duplicate
        ])
        assert identify.duplicate_mask(det).tolist() == [True, True]

    def test_cross_txid_duplicate_removed_with_ignore(self):
        det = make_detections([
            (0, 1, 10.0, 100, 40, 50.0),
            (0, 2, 10.1, 101, 40, 10.0),
        ])
        mask = identify.duplicate_mask(det, ignore_txid=True)
        assert mask.tolist() == [True, False]

    def test_soa_tol_separates_ghost_from_legit_cross_tx(self):
        """With soa_tol, cross-tx dedup drops only SoA-coincident pairs
        (a straddling ghost is the same signal, so its SoA matches the
        true detection); a legitimate weaker burst of a different
        transmitter in the adjacent block -- whose SoA is about a block
        away -- survives, instead of being deleted on adjacency alone."""
        new_len = 16384 - 4920
        det = make_detections([
            # rx 0: a straddling ghost pair (same signal, wrong code).
            (0, 1, 10.0, 100, 40, 50.0),
            (0, 2, 10.005, 101, 40, 10.0),
            # rx 1: a LEGITIMATE weaker different-tx burst one block
            # after a stronger one.
            (1, 5, 20.0, 200, 40, 100.0),
            (1, 6, 20.005, 201, 44, 20.0),
        ])
        det["soa"] = [100 * new_len + 6000.0,
                      100 * new_len + 6000.2,   # coincident with row 0
                      200 * new_len + 3000.0,
                      201 * new_len + 9000.0]   # its own arrival
        mask = identify.duplicate_mask(det, ignore_txid=True,
                                       soa_tol=4914.0)
        assert mask.tolist() == [True, False, True, True]
        # Without the tolerance, adjacency alone also deletes the
        # legitimate burst -- the documented limitation soa_tol fixes.
        mask_legacy = identify.duplicate_mask(det, ignore_txid=True)
        assert mask_legacy.tolist() == [True, False, True, False]

    def test_integrate_keep_txid(self):
        det = make_detections([
            (0, 7, 10.0, 100, 40, 50.0),
            (0, 3, 20.0, 200, 40, 50.0),
        ])
        out = identify.integrate(det, keep_txid=True, dedup_any_tx=True)
        assert sorted(out["txid"].tolist()) == [3, 7]

    def test_unidentified_removed(self):
        det = make_detections([
            (0, -1, 10.0, 100, 40, 50.0),
            (0, 1, 11.0, 110, 40, 50.0),
        ])
        mask = identify.duplicate_mask(det)
        assert mask.tolist() == [False, True]


def test_integrate_sorts_by_timestamp():
    det = make_detections([
        (0, -1, 30.0, 300, 40, 1.0),
        (0, -1, 10.0, 100, 40, 1.0),
        (0, -1, 20.0, 200, 40, 1.0),
    ] * 20)  # enough detections for auto-classify stats
    out = identify.integrate(det)
    assert np.all(np.diff(out["timestamp"]) >= 0)
    assert np.all(out["txid"] == 0)
