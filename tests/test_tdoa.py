"""TDOA estimation against a simulated receiver network with drifting
clocks and beacon transmitters."""

import io

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.pipeline import matchmaker, tdoa

C = tdoa.SPEED_OF_LIGHT
FS = 2.4e6

RX_POS = {0: np.array([0.0, 0.0]), 1: np.array([10000.0, 0.0])}
BEACON_POS = {9: np.array([5000.0, 2000.0])}
MOBILE_POS = {3: np.array([7000.0, 1000.0])}


def build_scenario(drift1=2e-6, offset1=12345.0, soa_noise=0.0,
                   mobile_times=(4.0, 9.0, 14.0), beacon_every=1.0,
                   duration=20.0):
    schedule = [(9, t) for t in np.arange(0.5, duration, beacon_every)]
    schedule += [(3, t) for t in mobile_times]
    det = sim.synth_network(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, schedule, FS,
        clock_offsets={1: offset1},
        clock_drifts={1: drift1},
        soa_noise=soa_noise)
    matches, _, _ = matchmaker.match_detections(det)
    return det, matches


def expected_tdoa(txpos):
    return (np.linalg.norm(txpos - RX_POS[0])
            - np.linalg.norm(txpos - RX_POS[1])) / C


class TestEstimate:
    def test_recovers_geometry_tdoa_despite_clock_error(self):
        det, matches = build_scenario()
        groups, failures = tdoa.estimate_tdoas(
            det, matches, window_size=8, beacon_pos=BEACON_POS,
            rx_pos=RX_POS, sample_rate=FS)
        assert len(groups) == 3
        assert not failures
        want = expected_tdoa(MOBILE_POS[3])
        for g in groups:
            assert g.tx == 3
            got = g.tdoas["tdoa"][0]
            # sub-nanosecond agreement on noiseless SoAs
            assert got == pytest.approx(want, abs=1e-9)

    @pytest.mark.parametrize("builder", [
        tdoa.build_model_poly,
        tdoa.build_model_nearest,
        tdoa.build_model_weighted_poly,
    ])
    def test_batched_matches_sequential(self, builder):
        """The vectorized estimator reproduces the sequential path for
        every standard clock model: same groups, same TDOAs
        (sub-picosecond), same qualities, same failure multiset."""
        det, matches = build_scenario(soa_noise=0.05, duration=40.0,
                                      mobile_times=tuple(
                                          np.arange(3.0, 38.0, 0.7)))
        seq_groups, seq_fail = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS,
            model_builder=builder, batched=False)
        bat_groups, bat_fail = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS,
            model_builder=builder, batched=True)
        assert len(bat_groups) == len(seq_groups)
        assert sorted(map(tuple, bat_fail)) == sorted(map(tuple, seq_fail))
        for sg, bg in zip(seq_groups, bat_groups):
            assert bg.group_id == sg.group_id
            assert bg.tx == sg.tx
            assert bg.timestamp == sg.timestamp
            np.testing.assert_array_equal(bg.tdoas["rx0"], sg.tdoas["rx0"])
            np.testing.assert_array_equal(
                bg.tdoas["det0_idx"], sg.tdoas["det0_idx"])
            np.testing.assert_allclose(
                bg.tdoas["tdoa"], sg.tdoas["tdoa"], atol=1e-12)
            np.testing.assert_allclose(
                bg.tdoas["snr"], sg.tdoas["snr"], rtol=1e-12)
            np.testing.assert_allclose(
                bg.tdoas["model_quality"], sg.tdoas["model_quality"],
                rtol=1e-9)

    def test_nearest_model_exact_tie_matches_sequential(self):
        """A mobile detection exactly equidistant between two beacon
        transmissions: the sequential bisect rule keeps the LATER
        beacon (strict `<` in build_model_nearest), and the batched
        masked argmin must break the tie the same way.  The two
        beacons are given different clock residuals so the choice is
        visible in the TDOA."""
        from thrifty_tpu.io import toad as toad_mod

        det = toad_mod.empty(6)
        rows = [
            # (rxid, txid, timestamp, soa)
            (0, 9, 1.0, 1.0 * FS),
            (1, 9, 1.0, 1.0 * FS + 100.0),
            (0, 3, 2.0, 2.0 * FS),
            (1, 3, 2.0, 2.0 * FS + 100.0),
            (0, 9, 3.0, 3.0 * FS),
            (1, 9, 3.0, 3.0 * FS + 100.0 + 7.0),  # rx1 clock jumped
        ]
        for i, (rx, tx, ts, soa) in enumerate(rows):
            det[i]["rxid"] = rx
            det[i]["txid"] = tx
            det[i]["timestamp"] = ts
            det[i]["block"] = int(soa // (16384 - 4920))
            det[i]["soa"] = soa
            det[i]["energy"] = 1000.0
            det[i]["noise"] = 10.0
        matches = [[0, 1], [2, 3], [4, 5]]
        kwargs = dict(window_size=8, beacon_pos=BEACON_POS,
                      rx_pos=RX_POS, sample_rate=FS,
                      model_builder=tdoa.build_model_nearest)
        seq, _ = tdoa.estimate_tdoas(det, matches, batched=False, **kwargs)
        bat, _ = tdoa.estimate_tdoas(det, matches, batched=True, **kwargs)
        assert len(seq) == len(bat) == 1
        # Both must have chosen the later (t=3.0) beacon; the 7-sample
        # jump separates the two choices by ~3 us so a wrong tie-break
        # cannot hide inside the comparison tolerance.
        np.testing.assert_allclose(bat[0].tdoas["tdoa"],
                                   seq[0].tdoas["tdoa"], atol=1e-15)

    def test_nearest_model_duplicate_timestamps_match_sequential(self):
        """Several beacon pairs sharing one timestamp (same capture
        block): bisect_left lands on the FIRST duplicate when the
        mobile is at/before it and on the LAST when after -- the
        batched emulation must reproduce both sides.  The duplicates
        carry different clock residuals so a wrong pick is visible."""
        from thrifty_tpu.io import toad as toad_mod

        det = toad_mod.empty(10)
        rows = [
            (0, 9, 2.0, 2.0 * FS),            # duplicate ts group A
            (1, 9, 2.0, 2.0 * FS + 100.0),
            (0, 9, 2.0, 2.0 * FS + 5.0),      # duplicate ts group B
            (1, 9, 2.0, 2.0 * FS + 100.0 + 9.0),
            # mobile BEFORE the duplicates
            (0, 3, 1.0, 1.0 * FS),
            (1, 3, 1.0, 1.0 * FS + 100.0),
            # mobile AT the duplicate timestamp
            (0, 4, 2.0, 2.0 * FS + 1.0),
            (1, 4, 2.0, 2.0 * FS + 101.0),
            # mobile AFTER the duplicates
            (0, 5, 3.0, 3.0 * FS),
            (1, 5, 3.0, 3.0 * FS + 100.0),
        ]
        for i, (rx, tx, ts, soa) in enumerate(rows):
            det[i]["rxid"] = rx
            det[i]["txid"] = tx
            det[i]["timestamp"] = ts
            det[i]["block"] = int(soa // (16384 - 4920))
            det[i]["soa"] = soa
            det[i]["energy"] = 1000.0
            det[i]["noise"] = 10.0
        matches = [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]]
        beacon_pos = dict(BEACON_POS)
        rx_pos = RX_POS
        kwargs = dict(window_size=8, beacon_pos=beacon_pos,
                      rx_pos=rx_pos, sample_rate=FS,
                      model_builder=tdoa.build_model_nearest)
        seq, _ = tdoa.estimate_tdoas(det, matches, batched=False, **kwargs)
        bat, _ = tdoa.estimate_tdoas(det, matches, batched=True, **kwargs)
        assert len(seq) == len(bat) == 3
        for a, b in zip(seq, bat):
            np.testing.assert_allclose(b.tdoas["tdoa"], a.tdoas["tdoa"],
                                       atol=1e-15)

    def test_sequential_nan_tdoa_is_failure_not_row(self):
        """Corrupt (NaN) beacon SoAs in every window: the sequential
        path must record failures -- not NaN .tdoa rows (the old
        ``abs(tdoa) >= MAX_TDOA`` gate is False for NaN) and not an
        aborted run (polyfit's SVD raises LinAlgError on NaN input)."""
        det, matches = build_scenario()
        beacon_rows = np.nonzero((det["txid"] == 9) & (det["rxid"] == 1))
        det["soa"][beacon_rows] = np.nan
        for builder in (tdoa.build_model_nearest, tdoa.build_model_poly):
            for batched in (False, True):
                groups, failures = tdoa.estimate_tdoas(
                    det, matches, 8, BEACON_POS, RX_POS, FS,
                    model_builder=builder, batched=batched)
                for g in groups:
                    assert np.all(np.isfinite(g.tdoas["tdoa"])), \
                        (builder.__name__, batched)

    @pytest.mark.parametrize("corrupt", [False, True])
    def test_equivalence_with_corruption_all_models(self, corrupt):
        """Sequential == batched for all four models on randomized
        multi-rx networks, including a NaN-corrupted beacon record:
        both paths drop the corrupt pair up front (one bad row must
        not poison its windows) and then agree exactly.  A 150-trial
        x 4-model offline campaign with duplicate beacon times,
        quantized timestamps, and random corruption recorded 600/600
        exact matches (values < 1e-11 s, identical failure sets)."""
        rng = np.random.default_rng(5 + corrupt)
        rx_pos = {i: rng.uniform(-1e4, 1e4, 2) for i in range(4)}
        beacon_pos = {9: rng.uniform(-5e3, 5e3, 2)}
        mobile_pos = {3: rng.uniform(-5e3, 5e3, 2)}
        schedule = [(9, t) for t in np.arange(0.5, 20, 1.0)]
        schedule += [(3, 5.0), (3, 11.0), (3, 16.5)]
        det = sim.synth_network(
            rx_pos, {**beacon_pos, **mobile_pos}, schedule, FS,
            clock_offsets={1: 700.0, 2: -4e3, 3: 55.5},
            clock_drifts={1: 2e-6, 2: -1e-6, 3: 4e-7},
            soa_noise=0.01, seed=3)
        if corrupt:
            rows = np.nonzero((det["txid"] == 9) & (det["rxid"] == 1))[0]
            det["soa"][rows[4]] = np.nan
        matches, _, _ = matchmaker.match_detections(det)
        for mb in (tdoa.build_model_poly, tdoa.build_model_nearest,
                   tdoa.build_model_weighted_poly,
                   tdoa.build_model_linear):
            seq, sf = tdoa.estimate_tdoas(
                det, matches, 8.0, beacon_pos, rx_pos, FS,
                model_builder=mb, batched=False)
            bat, bf = tdoa.estimate_tdoas(
                det, matches, 8.0, beacon_pos, rx_pos, FS,
                model_builder=mb, batched=True)
            assert len(seq) == len(bat), mb.__name__
            assert sorted(map(tuple, sf)) == sorted(map(tuple, bf)), \
                mb.__name__
            for a, b in zip(seq, bat):
                np.testing.assert_allclose(
                    b.tdoas["tdoa"], a.tdoas["tdoa"], atol=1e-11,
                    err_msg=mb.__name__)
                assert np.all(np.isfinite(a.tdoas["tdoa"])), mb.__name__

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_batched_equivalence_random_scenarios(self, seed):
        """Property: on randomized traffic (irregular beacon cadence,
        bursty mobiles, noise), all three batched models match the
        sequential path."""
        rng = np.random.default_rng(seed)
        beacon_times = np.cumsum(rng.uniform(0.3, 2.5, 40))
        mobile_times = np.cumsum(rng.uniform(0.2, 1.5, 30))
        horizon = min(beacon_times[-1], mobile_times[-1])
        schedule = [(9, float(t)) for t in beacon_times if t < horizon]
        schedule += [(3, float(t)) for t in mobile_times if t < horizon]
        det = sim.synth_network(
            RX_POS, {**BEACON_POS, **MOBILE_POS}, schedule, FS,
            clock_offsets={1: float(rng.uniform(-1e5, 1e5))},
            clock_drifts={1: float(rng.uniform(-1e-5, 1e-5))},
            soa_noise=0.1, seed=seed)
        matches, _, _ = matchmaker.match_detections(det)
        for builder in (tdoa.build_model_poly, tdoa.build_model_nearest,
                        tdoa.build_model_linear,
                        tdoa.build_model_weighted_poly):
            sg, sf = tdoa.estimate_tdoas(
                det, matches, 8, BEACON_POS, RX_POS, FS,
                model_builder=builder, batched=False)
            bg, bf = tdoa.estimate_tdoas(
                det, matches, 8, BEACON_POS, RX_POS, FS,
                model_builder=builder, batched=True)
            assert len(bg) == len(sg), builder.__name__
            assert sorted(map(tuple, bf)) == sorted(map(tuple, sf))
            for a, b in zip(sg, bg):
                np.testing.assert_allclose(
                    b.tdoas["tdoa"], a.tdoas["tdoa"], atol=1e-12,
                    err_msg=builder.__name__)

    def test_corrupt_beacon_record_drops_one_pair(self):
        """A NaN soa in one beacon record must not poison its whole
        window: the other beacons still fit and mobile TDOAs stay
        finite and accurate."""
        det, matches = build_scenario()
        beacon_rows = np.nonzero(det["txid"] == 9)[0]
        det["soa"][beacon_rows[3]] = np.nan
        groups, _ = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS, batched=True)
        assert len(groups) == 3
        want = expected_tdoa(MOBILE_POS[3])
        for g in groups:
            assert np.all(np.isfinite(g.tdoas["tdoa"]))
            assert g.tdoas["tdoa"][0] == pytest.approx(want, abs=1e-8)

    def test_batched_rejects_custom_model(self):
        def custom(pairs, sdoa, fs):
            return None
        with pytest.raises(ValueError):
            det, matches = build_scenario(duration=5.0,
                                          mobile_times=(2.0,))
            tdoa.estimate_tdoas(det, matches, 8, BEACON_POS, RX_POS,
                                FS, model_builder=custom, batched=True)

    def test_non_default_block_geometry(self):
        """synth_network derives block/sample split from the block
        geometry parameters, not the default 16384/4920."""
        schedule = [(9, t) for t in np.arange(0.5, 20.0, 1.0)]
        schedule += [(3, t) for t in (4.0, 9.0)]
        det = sim.synth_network(
            RX_POS, {**BEACON_POS, **MOBILE_POS}, schedule, FS,
            block_len=4096, history_len=1000)
        new_len = 4096 - 1000
        np.testing.assert_allclose(
            det["block"] * new_len + det["sample"], det["soa"],
            atol=1.0)
        matches, _, _ = matchmaker.match_detections(det)
        groups, failures = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS)
        assert not failures
        want = expected_tdoa(MOBILE_POS[3])
        for g in groups:
            assert g.tdoas["tdoa"][0] == pytest.approx(want, abs=1e-9)

    def test_large_clock_drift_still_recovered(self):
        det, matches = build_scenario(drift1=5e-5, offset1=1e9)
        groups, _ = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS)
        want = expected_tdoa(MOBILE_POS[3])
        for g in groups:
            assert g.tdoas["tdoa"][0] == pytest.approx(want, abs=5e-9)

    def test_insufficient_beacons_fails(self):
        det, matches = build_scenario(beacon_every=50.0)  # ~0 beacons/window
        groups, failures = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS)
        assert groups == []
        assert len(failures) == 3

    def test_noise_propagates_to_tdoa(self):
        det, matches = build_scenario(soa_noise=0.05,
                                      mobile_times=tuple(
                                          np.arange(4.0, 16.0, 0.5)))
        groups, _ = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS)
        want = expected_tdoa(MOBILE_POS[3])
        errs = np.array([g.tdoas["tdoa"][0] - want for g in groups])
        # 0.05-sample SoA noise -> tens of ns TDOA error scale
        assert np.sqrt(np.mean(errs**2)) < 200e-9
        assert np.max(np.abs(errs)) > 0  # noise actually present


class TestModels:
    def make_pairs(self, n=6):
        det, matches = build_scenario()
        beacons = tdoa.BeaconPairs(
            det, [m for m in matches if det[m[0]]["txid"] == 9])
        pairs, _ = beacons.extract(0, 1, 0.0, 20.0)
        return pairs

    def test_weighted_poly_close_to_poly(self):
        det, matches = build_scenario()
        g1, _ = tdoa.estimate_tdoas(det, matches, 8, BEACON_POS, RX_POS, FS,
                                    model_builder=tdoa.build_model_poly)
        g2, _ = tdoa.estimate_tdoas(det, matches, 8, BEACON_POS, RX_POS, FS,
                                    model_builder=tdoa.build_model_weighted_poly)
        for a, b in zip(g1, g2):
            assert a.tdoas["tdoa"][0] == pytest.approx(
                b.tdoas["tdoa"][0], abs=2e-9)

    def test_nearest_model(self):
        det, matches = build_scenario(drift1=0.0)  # nearest can't fit drift
        groups, _ = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS,
            model_builder=tdoa.build_model_nearest)
        want = expected_tdoa(MOBILE_POS[3])
        for g in groups:
            assert g.tdoas["tdoa"][0] == pytest.approx(want, abs=1e-9)


class TestIO:
    def test_round_trip(self):
        det, matches = build_scenario()
        groups, _ = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS)
        buf = io.StringIO()
        tdoa.save_tdoa_groups(buf, groups)
        buf.seek(0)
        back = tdoa.load_tdoa_groups(buf)
        assert len(back) == len(groups)
        for a, b in zip(groups, back):
            assert a.group_id == b.group_id
            assert a.tx == b.tx
            np.testing.assert_allclose(
                a.tdoas["tdoa"], b.tdoas["tdoa"], atol=1e-15)

    def test_pos_config(self):
        cfg = io.StringIO("0: 100.0 200.0\n1: -5 7 9\n")
        pos = tdoa.load_pos_config(cfg)
        np.testing.assert_array_equal(pos[0], [100.0, 200.0])
        np.testing.assert_array_equal(pos[1], [-5, 7, 9])


class TestLinearModel:
    """The reference's experimental piecewise-linear clock model
    (thrifty/tdoa_est.py:186-222)."""

    def test_recovers_geometry_tdoa(self):
        det, matches = build_scenario()
        groups, failures = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS,
            model_builder=tdoa.build_model_linear, batched=False)
        assert not failures
        want = expected_tdoa(MOBILE_POS[3])
        assert len(groups) == 3
        for g in groups:
            # linear interpolation between 1 s beacon intervals with
            # 2e-6 drift: sub-ns accuracy expected
            assert g.tdoas["tdoa"][0] == pytest.approx(want, abs=2e-9)

    def test_agrees_with_poly_model(self):
        det, matches = build_scenario(drift1=5e-6)
        lin, _ = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS,
            model_builder=tdoa.build_model_linear, batched=False)
        pol, _ = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS,
            model_builder=tdoa.build_model_poly, batched=False)
        for gl, gp in zip(lin, pol):
            np.testing.assert_allclose(
                gl.tdoas["tdoa"], gp.tdoas["tdoa"], atol=2e-9)

    def test_needs_two_beacon_pairs(self):
        # One beacon transmission in the window: model is None ->
        # every mobile pair becomes a failure (reference returns None
        # for len < 2).
        det, matches = build_scenario(beacon_every=30.0,
                                      mobile_times=(4.0,))
        groups, failures = tdoa.estimate_tdoas(
            det, matches, 8, BEACON_POS, RX_POS, FS,
            model_builder=tdoa.build_model_linear, batched=False)
        assert groups == [] and len(failures) == 1

    def test_cli_model_linear(self, tmp_path):
        det, matches = build_scenario()
        toads = tmp_path / "rx.toads"
        mpath = tmp_path / "rx.match"
        from thrifty_tpu.io import toad as toad_io
        with open(toads, "w") as f:
            toad_io.save(f, det, with_txid=True)
        matchmaker.save_matches(str(mpath), matches)
        rxcfg = tmp_path / "rx.cfg"
        rxcfg.write_text("0: 0 0\n1: 10000 0\n")
        bcfg = tmp_path / "beacon.cfg"
        bcfg.write_text("9: 5000 2000\n")
        out = tmp_path / "out.tdoa"
        from thrifty_tpu.pipeline.tdoa import _main
        _main([str(toads), str(mpath), "-o", str(out),
               "-r", str(rxcfg), "-b", str(bcfg), "--model", "linear"])
        groups = tdoa.load_tdoa_groups(str(out))
        assert len(groups) == 3


class TestOutlierMask:
    def test_mad_zero_flags_deviating_point(self):
        """Majority-identical data with one wild point: MAD is 0 and
        the wild point must still be flagged (reference inf/nan
        semantics, thrifty/stat_tools.py); an all-False return here
        would let one corrupt beacon SDOA poison the clock model."""
        from thrifty_tpu import stats

        mask = stats.is_outlier(np.array([5.0, 5.0, 5.0, 5.0, 5.0, 100.0]))
        assert mask.tolist() == [False] * 5 + [True]

    def test_mad_zero_all_identical_no_outliers(self):
        from thrifty_tpu import stats

        mask = stats.is_outlier(np.full(6, 7.25))
        assert not mask.any()

    def test_batched_matches_sequential_at_quantized_sdoa(self):
        """The batched clock-model path inlines its own masked-median
        MAD; at mad == 0 it must break ties exactly like
        stats.is_outlier so both TDOA paths stay equivalent."""
        from thrifty_tpu import stats

        vals = np.array([3.0, 3.0, 3.0, 3.0, -50.0, 3.0])
        seq_keep = ~stats.is_outlier(vals)
        med = np.median(vals)
        diff = np.abs(vals - med)
        mad = np.median(diff)
        with np.errstate(invalid="ignore", divide="ignore"):
            outlier = (0.6745 * diff / mad) > 3.5
        outlier = np.where(mad > 0, outlier, diff > 0)
        np.testing.assert_array_equal(seq_keep, ~outlier)


class TestBatchedFitIsolation:
    def test_singular_window_does_not_perturb_healthy_rows(self):
        """One exactly singular window in a batch (e.g. duplicated
        records collapsing its x support) must not change any healthy
        window's fitted polynomial: the LinAlgError fallback ridges
        only the offending row, never the whole batch."""
        from thrifty_tpu.pipeline.tdoa import _fit_quadratic_batched

        x_h = np.array([0.0, 1.0, 2.0, 3.0])
        y_h = np.array([1.0, 2.0, 5.0, 10.0])  # exact quadratic x^2+1
        x_s = np.full(4, 5.0)                  # zero x-variance: singular
        y_s = np.array([1.0, 2.0, 3.0, 4.0])
        m = np.ones((2, 4))
        w = np.ones((2, 4))
        ok = np.array([True, True])

        x = np.stack([x_h, x_s])
        y = np.stack([y_h, y_s])
        _, _, _, coef_mixed = _fit_quadratic_batched(x, y, m, w, ok)

        _, _, _, coef_alone = _fit_quadratic_batched(
            x_h[None], y_h[None], m[:1], w[:1], ok[:1])
        np.testing.assert_array_equal(coef_mixed[0], coef_alone[0])
        assert np.all(np.isfinite(coef_mixed[1]))


class TestSolve1dValidation:
    def test_stale_config_skips_group_with_clear_reason(self, capsys):
        """A 1-D TDOA group referencing receivers absent from the
        coordinate config is skipped as an EstimationError (not
        silently positioned between the config's own receivers)."""
        from thrifty_tpu.pipeline import pos, tdoa as tdoa_mod

        rx_pos = {0: np.array([0.0]), 1: np.array([100.0])}
        rows = np.array([(5, 6, 1e-7, 100.0, 1.0, 0, 0)],
                        dtype=tdoa_mod.TDOA_DTYPE)
        g = tdoa_mod.TdoaGroup(group_id=3, timestamp=0.0, tx=1,
                               tdoas=rows)
        out = pos.solve([g], rx_pos)
        assert len(out) == 0
        err = capsys.readouterr().err
        assert "group #3" in err and "coordinate config" in err
