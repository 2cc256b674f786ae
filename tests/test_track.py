"""Kalman position tracker."""

import numpy as np
import pytest

from thrifty_tpu.pipeline import track


def moving_target_fixes(n=60, dt=1.0, noise=8.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * dt
    true_x = 1000.0 + 3.0 * t          # 3 m/s east
    true_y = 2000.0 + 1.0 * t          # 1 m/s north
    rows = [(float(t[i]), 3, 1.0, 100.0,
             true_x[i] + rng.normal(0, noise),
             true_y[i] + rng.normal(0, noise))
            for i in range(n)]
    results = np.array(rows, dtype=[
        ("group_id", "f8"), ("tx", "i4"), ("dop", "f8"), ("snr", "f8"),
        ("x", "f8"), ("y", "f8")])
    # track_positions needs timestamp/tx/dop/x/y fields; rename group_id.
    out = np.zeros(n, dtype=[
        ("group_id", "i4"), ("timestamp", "f8"), ("tx", "i4"),
        ("dop", "f8"), ("snr", "f8"), ("x", "f8"), ("y", "f8")])
    out["timestamp"] = results["group_id"]
    for f in ("tx", "dop", "snr", "x", "y"):
        out[f] = results[f]
    return out, true_x, true_y


def test_tracker_reduces_noise():
    fixes, true_x, true_y = moving_target_fixes()
    tracks = track.track_positions(fixes, accel_std=0.5, meas_std=8.0)
    # Compare steady-state (after convergence) errors.
    raw_err = np.hypot(fixes["x"][20:] - true_x[20:],
                       fixes["y"][20:] - true_y[20:])
    trk_err = np.hypot(tracks["x"][20:] - true_x[20:],
                       tracks["y"][20:] - true_y[20:])
    assert np.sqrt(np.mean(trk_err**2)) < 0.6 * np.sqrt(
        np.mean(raw_err**2))


def test_velocity_estimated():
    fixes, _, _ = moving_target_fixes(noise=2.0)
    tracks = track.track_positions(fixes, accel_std=0.2, meas_std=2.0)
    assert tracks["vx"][-1] == pytest.approx(3.0, abs=0.5)
    assert tracks["vy"][-1] == pytest.approx(1.0, abs=0.5)
    assert tracks["speed"][-1] == pytest.approx(np.hypot(3, 1), abs=0.5)


def test_per_transmitter_tracks():
    fixes, _, _ = moving_target_fixes(n=10)
    other = fixes.copy()
    other["tx"] = 7
    other["x"] += 5000
    both = np.concatenate([fixes, other])
    tracks = track.track_positions(both)
    assert set(np.unique(tracks["tx"])) == {3, 7}
    t3 = tracks[tracks["tx"] == 3]
    t7 = tracks[tracks["tx"] == 7]
    assert abs(t7["x"].mean() - t3["x"].mean()) > 4000


def test_cli_round_trip(tmp_path):
    from thrifty_tpu.pipeline import pos as pos_mod

    fixes, _, _ = moving_target_fixes(n=12)
    # Write a .pos file in the standard format.
    rows = [(i, fixes["timestamp"][i], 3, 1.0, 100.0,
             fixes["x"][i], fixes["y"][i]) for i in range(len(fixes))]
    arr = np.array(rows, dtype=[
        ("group_id", "i4"), ("timestamp", "f8"), ("tx", "i4"),
        ("dop", "f8"), ("snr", "f8"), ("x", "f8"), ("y", "f8")])
    posfile = str(tmp_path / "data.pos")
    pos_mod.save_positions(posfile, arr)

    out = str(tmp_path / "data.track")
    track._main([posfile, "-o", out])
    lines = open(out).read().splitlines()
    assert len(lines) == 12
    assert len(lines[0].split()) == 7


def test_singular_dop_fixes_skipped():
    """A fix with dop <= 0 (singular geometry) must not enter the
    track -- its error is unbounded."""
    fixes, _, _ = moving_target_fixes(n=10)
    rows = [(i, fixes["timestamp"][i], 3, 1.0, 100.0,
             fixes["x"][i], fixes["y"][i]) for i in range(len(fixes))]
    arr = np.array(rows, dtype=[
        ("group_id", "i4"), ("timestamp", "f8"), ("tx", "i4"),
        ("dop", "f8"), ("snr", "f8"), ("x", "f8"), ("y", "f8")])
    # Corrupt one fix wildly and mark its geometry singular.
    arr["x"][4] += 1e6
    arr["dop"][4] = -1.0
    out = list(track.update_states({}, arr))
    assert len(out) == 9  # the singular fix is skipped entirely
    for _, _, state in out:
        assert abs(state[0]) < 1e5
