"""Multilateration: forward-model TDOAs from known geometry -> solver."""

import numpy as np
import pytest

from thrifty_tpu.pipeline import pos, tdoa

C = pos.SPEED_OF_LIGHT


def forward_tdoas(tx, rx_pos, pairs, snr=100.0):
    rows = []
    for rx0, rx1 in pairs:
        t = (np.linalg.norm(tx - rx_pos[rx0])
             - np.linalg.norm(tx - rx_pos[rx1])) / C
        rows.append((rx0, rx1, t, snr, 1.0, 0, 0))
    return np.array(rows, dtype=tdoa.TDOA_DTYPE)


RX4 = {
    0: np.array([0.0, 0.0]),
    1: np.array([9000.0, 500.0]),
    2: np.array([4000.0, 8000.0]),
    3: np.array([-2000.0, 6000.0]),
}
PAIRS4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


class TestSolve2D:
    @pytest.mark.parametrize("tx", [
        [3000.0, 3000.0], [7500.0, 2500.0], [-500.0, 4000.0],
        [4810.5, 5213.25],
    ])
    def test_recovers_position(self, tx):
        tx = np.array(tx)
        tdoas = forward_tdoas(tx, RX4, PAIRS4)
        est, snr = pos.solve_group(tdoas, RX4)
        np.testing.assert_allclose(est, tx, atol=1e-3)
        assert snr == pytest.approx(100.0)

    def test_weighted_downweights_noisy_tdoa(self):
        rng = np.random.default_rng(3)
        tx = np.array([5000.0, 3000.0])
        tdoas = forward_tdoas(tx, RX4, PAIRS4, snr=10000.0)
        # Corrupt one pair badly and mark it low-SNR.
        tdoas["tdoa"][2] += 300.0 / C  # 300 m error
        tdoas["snr"][2] = 1.0
        unweighted, _ = pos.solve_group(tdoas, RX4)
        weighted, _ = pos.solve_group(tdoas, RX4, weighted=True)
        err_u = np.linalg.norm(unweighted - tx)
        err_w = np.linalg.norm(weighted - tx)
        assert err_w < err_u / 5
        assert err_w < 2.0

    def test_underdetermined_raises(self):
        tdoas = forward_tdoas(np.array([1.0, 2.0]), RX4, [(0, 1)])
        with pytest.raises(pos.EstimationError):
            pos.solve_group(tdoas, RX4)


class TestSolve3D:
    RX5 = {
        0: np.array([0.0, 0.0, 0.0]),
        1: np.array([9000.0, 500.0, 50.0]),
        2: np.array([4000.0, 8000.0, 120.0]),
        3: np.array([-2000.0, 6000.0, 10.0]),
        4: np.array([3000.0, -4000.0, 200.0]),
    }
    PAIRS5 = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4)]

    def test_recovers_3d_position(self):
        tx = np.array([3500.0, 2500.0, 300.0])
        tdoas = forward_tdoas(tx, self.RX5, self.PAIRS5)
        est, _ = pos.solve_group(tdoas, self.RX5)
        np.testing.assert_allclose(est, tx, atol=0.5)

    def test_solve_writes_z_column(self):
        tx = np.array([3500.0, 2500.0, 300.0])
        groups = [tdoa.TdoaGroup(
            group_id=0, timestamp=1.0, tx=3,
            tdoas=forward_tdoas(tx, self.RX5, self.PAIRS5))]
        results = pos.solve(groups, self.RX5)
        assert "z" in results.dtype.names
        assert results[0]["z"] == pytest.approx(300.0, abs=1.0)


class TestSolve1D:
    def test_between_two_receivers(self):
        rx = {0: np.array([0.0]), 1: np.array([10000.0])}
        tx = np.array([3000.0])
        tdoas = forward_tdoas(tx, rx, [(0, 1)])
        est, _ = pos.solve_1d(tdoas, rx)
        assert est[0] == pytest.approx(3000.0, abs=1e-6)


class TestDop:
    def test_surrounded_better_than_outside(self):
        inside = pos.dop([4000.0, 4000.0], RX4, PAIRS4)
        outside = pos.dop([40000.0, 40000.0], RX4, PAIRS4)
        assert 0 < inside < outside

    def test_1d_exact(self):
        rx = {0: np.array([0.0]), 1: np.array([1000.0])}
        # G = [-x/d0 - (x-1000)/d1 ...] at midpoint: (-1) - (1) = -2
        d = pos.dop([500.0], rx, [(0, 1)])
        assert d == pytest.approx(0.5)


class TestSolveGroups:
    def test_end_to_end_group_solve(self):
        tx = np.array([6000.0, 3500.0])
        groups = [tdoa.TdoaGroup(
            group_id=5, timestamp=123.0, tx=3,
            tdoas=forward_tdoas(tx, RX4, PAIRS4))]
        results = pos.solve(groups, RX4)
        assert len(results) == 1
        assert results[0]["group_id"] == 5
        assert results[0]["tx"] == 3
        np.testing.assert_allclose(
            [results[0]["x"], results[0]["y"]], tx, atol=1e-3)
        assert results[0]["dop"] > 0


class TestSolveBatchedGroups:
    def test_matches_scipy_path(self):
        rng = np.random.default_rng(1)
        groups = []
        for i, tx in enumerate(rng.uniform(0, 8000, size=(12, 2))):
            # Ragged groups: drop a couple of pairs from some groups.
            pairs = PAIRS4 if i % 3 else PAIRS4[:4]
            groups.append(tdoa.TdoaGroup(
                group_id=i, timestamp=float(i), tx=3,
                tdoas=forward_tdoas(np.asarray(tx), RX4, pairs)))
        ref = pos.solve(groups, RX4)
        got = pos.solve_batched(groups, RX4)
        assert len(got) == len(ref) == 12
        np.testing.assert_allclose(got["x"], ref["x"], atol=0.5)
        np.testing.assert_allclose(got["y"], ref["y"], atol=0.5)
        np.testing.assert_allclose(got["dop"], ref["dop"], rtol=1e-3)

    def test_weighted_matches_scipy_path(self):
        """Batched + weighted agrees with the scipy weighted solver
        (reference TODO thrifty/pos_est.py:59, batched here)."""
        rng = np.random.default_rng(4)
        groups = []
        for i, tx in enumerate(rng.uniform(0, 8000, size=(10, 2))):
            tdoas = forward_tdoas(np.asarray(tx), RX4, PAIRS4, snr=10000.0)
            # Corrupt one pair per group and mark it low-SNR.
            bad = i % len(PAIRS4)
            tdoas["tdoa"][bad] += rng.uniform(100.0, 400.0) / C
            tdoas["snr"][bad] = 1.0
            groups.append(tdoa.TdoaGroup(
                group_id=i, timestamp=float(i), tx=3, tdoas=tdoas))
        ref = pos.solve(groups, RX4, weighted=True)
        got = pos.solve_batched(groups, RX4, weighted=True)
        assert len(got) == len(ref) == 10
        np.testing.assert_allclose(got["x"], ref["x"], atol=0.5)
        np.testing.assert_allclose(got["y"], ref["y"], atol=0.5)

    def test_weighted_batched_downweights_noisy_tdoa(self):
        tx = np.array([5000.0, 3000.0])
        tdoas = forward_tdoas(tx, RX4, PAIRS4, snr=10000.0)
        tdoas["tdoa"][2] += 300.0 / C
        tdoas["snr"][2] = 1.0
        groups = [tdoa.TdoaGroup(0, 0.0, 3, tdoas)]
        unweighted = pos.solve_batched(groups, RX4)
        weighted = pos.solve_batched(groups, RX4, weighted=True)
        err_u = np.hypot(unweighted["x"][0] - tx[0],
                         unweighted["y"][0] - tx[1])
        err_w = np.hypot(weighted["x"][0] - tx[0],
                         weighted["y"][0] - tx[1])
        assert err_w < err_u / 5
        assert err_w < 2.0

    def test_multi_start_escapes_mirror_basin(self):
        """Near-collinear receiver array, transmitter well off the
        line: the TDOA objective has a mirror local minimum with a
        clearly WORSE residual, and the centroid start sits on the
        symmetry line -- single-start GN rolled into the wrong basin
        and converged 17 km from the (noise-free, exact) solution.
        Multi-start from the receiver bounding-box corners must find
        the true minimum."""
        from thrifty_tpu.pipeline import tdoa as tdoa_mod

        C = tdoa_mod.SPEED_OF_LIGHT
        rx = {0: np.array([2066.0, -1867.0]), 1: np.array([439.0, 29.0]),
              2: np.array([-1205.0, 1922.0]), 3: np.array([-2837.0, 3821.0])}
        tx = np.array([9754.6, 3013.4])
        rows = []
        for i in range(4):
            for j in range(i + 1, 4):
                t = (np.linalg.norm(tx - rx[i])
                     - np.linalg.norm(tx - rx[j])) / C
                rows.append((i, j, t, 1e4, 1.0, 0, 0))
        g = tdoa_mod.TdoaGroup(
            group_id=0, timestamp=0.0, tx=3,
            tdoas=np.array(rows, dtype=tdoa_mod.TDOA_DTYPE))
        got = pos.solve_batched([g], rx)
        np.testing.assert_allclose([got["x"][0], got["y"][0]], tx,
                                   atol=1.0)

    def test_coplanar_mirror_reaches_equal_residual_minimum(self):
        """Near-coplanar 3-D array (z spread ~400 m over a 60 km
        aperture): the transmitter altitude is mirror-ambiguous across
        the array plane, so two minima with numerically EQUAL residual
        sit ~2.5 km apart in z (validation_sweep seed 318 trial 71 --
        scipy lands at z=+1056, GN at z=-1436, residual norms equal to
        8 digits).  Which basin a solver picks is start-point luck; the
        solver contract is reaching residual parity with scipy's
        trust-region solution, not matching its basin."""
        rx = {0: np.array([-29181.41857066, 25948.32954709, -222.0839601]),
              1: np.array([16777.85870735, 22205.93886653, 162.13191117]),
              2: np.array([8084.68323547, -17724.71793607, -203.5907017]),
              3: np.array([2359.35794116, -20197.98664509, 174.45982677])}
        tx = np.array([9591.92232974, -21816.26055646, 1086.28934725])
        rng = np.random.default_rng(71)
        rows = []
        for i in range(4):
            for j in range(i + 1, 4):
                t = (np.linalg.norm(tx - rx[i])
                     - np.linalg.norm(tx - rx[j])) / C
                rows.append((i, j, t + rng.normal(0, 50e-9),
                             1e4, 1.0, 0, 0))
        g = tdoa.TdoaGroup(
            group_id=0, timestamp=0.0, tx=3,
            tdoas=np.array(rows, dtype=tdoa.TDOA_DTYPE))
        ref = pos.solve([g], rx, verbose=False)
        got = pos.solve_batched([g], rx, verbose=False)
        rxp = np.array([rx[i] for i in range(4)])

        def resid_norm(row):
            p = np.array([row["x"][0], row["y"][0], row["z"][0]])
            r = [np.linalg.norm(p - rxp[i]) - np.linalg.norm(p - rxp[j])
                 - row_t * C for (i, j, row_t, *_) in rows]
            return float(np.linalg.norm(r))

        res_ref, res_got = resid_norm(ref), resid_norm(got)
        assert res_got <= res_ref * 1.01 + 1.0
        # Horizontal position is NOT ambiguous; only altitude mirrors.
        assert np.hypot(got["x"][0] - tx[0],
                        got["y"][0] - tx[1]) < 350.0

    def test_near_singular_geometry_reports_huge_dop(self):
        """Near-degenerate geometry must yield a huge *finite* DOP (so
        downstream weighting distrusts the fix) -- only exact
        singularity reports -1 (matching the per-group dop())."""
        rx0 = np.array([[[0.0, 0.0], [0.0, 0.0], [9000.0, 500.0]]])
        rx1 = np.array([[[9000.0, 500.0], [4000.0, 8000.0],
                         [4000.0, 8000.0]]])
        mask = np.ones((1, 3))
        # Position astronomically far away: all unit vectors nearly
        # parallel -> G rows ~ 0 -> tiny but nonzero det -> huge DOP.
        far = np.array([[1e9, 1e9]])
        d_far = pos._dop_batched(far, rx0, rx1, mask)
        assert np.isfinite(d_far[0]) and d_far[0] > 1e3
        # Exactly singular (det == 0 in floats: collinear on-axis
        # geometry, GtG = [[8,0],[0,0]]) -> -1, like the per-group
        # dop() whose np.linalg.inv raises there.
        rx0s = np.array([[[0.0, 0.0], [0.0, 0.0]]])
        rx1s = np.array([[[8000.0, 0.0], [8000.0, 0.0]]])
        on_axis = np.array([[4000.0, 0.0]])
        d_sing = pos._dop_batched(on_axis, rx0s, rx1s, np.ones((1, 2)))
        assert d_sing[0] == -1.0
        ref_sing = pos.dop(on_axis[0], {0: rx0s[0, 0], 1: rx1s[0, 0]},
                           [(0, 1), (0, 1)])
        assert ref_sing == -1.0
        # Healthy geometry stays consistent with the per-group dop().
        good = np.array([[4000.0, 3000.0]])
        d_good = pos._dop_batched(good, rx0, rx1, mask)
        ref = pos.dop(good[0], {0: rx0[0, 0], 1: rx1[0, 0],
                                2: rx1[0, 1]},
                      [(0, 1), (0, 2), (1, 2)])
        assert d_good[0] == pytest.approx(ref, rel=1e-9)

    def test_underdetermined_skipped(self):
        tx = np.array([3000.0, 3000.0])
        groups = [
            tdoa.TdoaGroup(0, 0.0, 3, forward_tdoas(tx, RX4, PAIRS4)),
            tdoa.TdoaGroup(1, 1.0, 3, forward_tdoas(tx, RX4, [(0, 1)])),
        ]
        got = pos.solve_batched(groups, RX4)
        assert got["group_id"].tolist() == [0]

    def test_empty(self):
        assert len(pos.solve_batched([], RX4)) == 0


class TestBatchedSolver:
    def test_matches_scipy_solver(self):
        rng = np.random.default_rng(0)
        txs = rng.uniform(0, 8000, size=(16, 2))
        groups = [forward_tdoas(t, RX4, PAIRS4) for t in txs]
        tdoa_pad = np.stack([g["tdoa"] for g in groups])
        mask = np.ones_like(tdoa_pad, dtype=bool)
        rx0 = np.stack([[RX4[int(a)] for a in g["rx0"]] for g in groups])
        rx1 = np.stack([[RX4[int(b)] for b in g["rx1"]] for g in groups])
        coords = np.array(list(RX4.values()))
        bounds = (coords.min(0) - pos.MAX_DIST, coords.max(0) + pos.MAX_DIST)
        est = np.asarray(pos.solve_groups_batched(
            tdoa_pad, mask, rx0, rx1, bounds))
        np.testing.assert_allclose(est, txs, atol=0.5)

    def test_masked_pairs_ignored(self):
        tx = np.array([3000.0, 3000.0])
        g = forward_tdoas(tx, RX4, PAIRS4)
        tdoa_pad = np.concatenate([g["tdoa"], [999.0]])[None, :]
        mask = np.array([[True] * len(PAIRS4) + [False]])
        rx0 = np.stack(
            [[RX4[int(a)] for a in g["rx0"]] + [RX4[0]]])
        rx1 = np.stack(
            [[RX4[int(b)] for b in g["rx1"]] + [RX4[1]]])
        coords = np.array(list(RX4.values()))
        bounds = (coords.min(0) - pos.MAX_DIST, coords.max(0) + pos.MAX_DIST)
        est = np.asarray(pos.solve_groups_batched(
            tdoa_pad, mask, rx0, rx1, bounds))
        np.testing.assert_allclose(est[0], tx, atol=0.5)


class TestIO:
    def test_empty_pos_file(self, tmp_path):
        path = str(tmp_path / "empty.pos")
        open(path, "w").close()
        back = pos.load_positions(path)
        assert len(back) == 0
        assert "timestamp" in back.dtype.names

    def test_projected_coordinates(self):
        # UTM-style coordinates far from the origin must not crash the
        # bounded solver (initial guess inside the bounds box).
        offset = np.array([500000.0, 4000000.0])
        rx = {k: v + offset for k, v in RX4.items()}
        tx = np.array([4000.0, 3000.0]) + offset
        tdoas = forward_tdoas(tx, rx, PAIRS4)
        est, _ = pos.solve_group(tdoas, rx)
        np.testing.assert_allclose(est, tx, atol=1e-2)

    def test_round_trip(self, tmp_path):
        tx = np.array([6000.0, 3500.0])
        groups = [tdoa.TdoaGroup(
            group_id=1, timestamp=123.456789, tx=3,
            tdoas=forward_tdoas(tx, RX4, PAIRS4))]
        results = pos.solve(groups, RX4)
        path = str(tmp_path / "data.pos")
        pos.save_positions(path, results)
        back = pos.load_positions(path)
        assert back[0]["group_id"] == 1
        assert back[0]["x"] == pytest.approx(results[0]["x"])
        assert back[0]["timestamp"] == pytest.approx(123.456789)


class TestUnknownReceiver:
    """A group referencing a receiver absent from the coordinate config
    (stale pos-rx.cfg, extra receiver) is skipped with a diagnostic --
    an uncaught KeyError here aborted the whole batch run and killed
    the live server loop."""

    def _groups(self):
        tx = np.array([3000.0, 3000.0])
        good = tdoa.TdoaGroup(0, 0.0, 3, forward_tdoas(tx, RX4, PAIRS4))
        rows = forward_tdoas(tx, RX4, PAIRS4).copy()
        rows["rx1"][0] = 7  # receiver 7 has no coordinates
        bad = tdoa.TdoaGroup(1, 1.0, 3, rows)
        return [good, bad]

    def test_solve_skips_and_reports(self, capsys):
        got = pos.solve(self._groups(), RX4)
        assert got["group_id"].tolist() == [0]
        assert "not in coordinate config" in capsys.readouterr().err

    def test_solve_batched_skips_and_reports(self, capsys):
        got = pos.solve_batched(self._groups(), RX4)
        assert got["group_id"].tolist() == [0]
        assert "not in coordinate config" in capsys.readouterr().err

    def test_verbose_false_is_silent(self, capsys):
        pos.solve(self._groups(), RX4, verbose=False)
        pos.solve_batched(self._groups(), RX4, verbose=False)
        assert capsys.readouterr().err == ""

    def test_verbose_false_silences_underdetermined(self, capsys):
        tx = np.array([3000.0, 3000.0])
        under = tdoa.TdoaGroup(
            0, 0.0, 3, forward_tdoas(tx, RX4, [(0, 1)]))
        pos.solve([under], RX4, verbose=False)
        pos.solve_batched([under], RX4, verbose=False)
        assert capsys.readouterr().err == ""
