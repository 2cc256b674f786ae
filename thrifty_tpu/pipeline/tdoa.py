"""TDOA estimation with beacon-based clock synchronisation.

Receivers have free-running sample clocks; beacon transmitters at known
positions provide the synchronisation reference.  For each receiver pair
a polynomial model mapping one receiver's sample counter onto the
other's is fitted through the beacon detections (their expected SDOA is
known from geometry), and mobile-unit TDOAs are read off the model
(reference thrifty/tdoa_est.py:43-105,234-303).

The numerically critical per-pair model fit stays in float64 numpy on
host: groups are small and irregular (SURVEY.md section 7 "hard parts"),
while polyfits across many (group, pair) combinations are batched where
possible.
"""

from __future__ import annotations

import argparse
import bisect
import collections
import itertools
import sys

import numpy as np

from thrifty_tpu import stats
from thrifty_tpu.config.settings import parse_kv_config
from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import matchmaker

SPEED_OF_LIGHT = 2.997e8
MAX_TDOA = 30e3 / SPEED_OF_LIGHT  # reject TDOAs implying > 30 km

TDOA_DTYPE = np.dtype([
    ("rx0", "i4"), ("rx1", "i4"), ("tdoa", "f8"), ("snr", "f8"),
    ("model_quality", "f8"), ("det0_idx", "i4"), ("det1_idx", "i4"),
])

TdoaGroup = collections.namedtuple(
    "TdoaGroup", ["group_id", "timestamp", "tx", "tdoas"])


def _dist(a, b):
    return float(np.sqrt(np.sum((np.asarray(a, dtype=np.float64)
                                 - np.asarray(b, dtype=np.float64)) ** 2)))


class BeaconPairs:
    """Per receiver-pair sorted beacon detection pairs with windowed lookup."""

    def __init__(self, detections, beacon_matches):
        pairs = collections.defaultdict(list)
        for group in beacon_matches:
            for i0, i1 in itertools.combinations(group, 2):
                d0, d1 = detections[i0], detections[i1]
                if d0["rxid"] > d1["rxid"]:
                    d0, d1 = d1, d0
                pairs[(int(d0["rxid"]), int(d1["rxid"]))].append((d0, d1))
        self._pairs = {}
        self._times = {}
        self._window_cache = {}
        for key, plist in pairs.items():
            plist.sort(key=lambda p: p[0]["timestamp"])
            self._pairs[key] = plist
            self._times[key] = [float(p[0]["timestamp"]) for p in plist]

    def extract(self, rx0, rx1, t_start, t_stop):
        """Beacon pairs in [t_start, t_stop], MAD outliers removed.

        Returns ``(pairs, window_key)``; the key identifies the exact
        beacon slice, so clock models fitted on it can be reused across
        mobile groups that see the same window.
        """
        key = (rx0, rx1)
        if key not in self._pairs:
            return [], None
        times = self._times[key]
        left = bisect.bisect_left(times, t_start)
        right = bisect.bisect_right(times, t_stop)
        window_key = (rx0, rx1, left, right)
        cached = self._window_cache.get(window_key)
        if cached is not None:
            return cached, window_key
        selected = self._pairs[key][left:right]
        if len(selected) > 1:
            sdoa = np.array([p[0]["soa"] - p[1]["soa"] for p in selected])
            keep = ~stats.is_outlier(sdoa)
            selected = [p for p, k in zip(selected, keep) if k]
        self._window_cache[window_key] = selected
        return selected, window_key


def build_model_poly(pairs, beacon_sdoa, sample_rate, deg=2):
    """Default clock model: deg-2 polyfit soa1+sdoa -> soa0.

    Returns evaluate(det0, det1) -> tdoa seconds, or None when there are
    not enough beacon transmissions to constrain the fit.
    """
    if len(pairs) < deg + 1:
        return None
    soa0 = np.array([p[0]["soa"] for p in pairs])
    soa1 = np.array([p[1]["soa"] for p in pairs])
    coef = np.polyfit(soa1 + np.asarray(beacon_sdoa), soa0, deg)
    fit = np.poly1d(coef)

    def evaluate(det0, det1):
        return (det0["soa"] - fit(det1["soa"])) / sample_rate

    return evaluate


def build_model_weighted_poly(pairs, beacon_sdoa, sample_rate, deg=2):
    """Polyfit weighted by proximity to the mobile detection."""
    if len(pairs) < deg + 1:
        return None
    soa0 = np.array([p[0]["soa"] for p in pairs])
    soa1 = np.array([p[1]["soa"] for p in pairs])
    soa1at0 = soa1 + np.asarray(beacon_sdoa)

    def evaluate(det0, det1):
        with np.errstate(divide="ignore"):
            weights = np.sqrt(1.0 / np.abs(soa0 - det0["soa"]))
        weights = np.where(np.isfinite(weights), weights, 1.0)
        weights = np.sqrt(weights / np.max(weights))
        weights = (weights + 2) / 3
        coef = np.polyfit(soa1at0, soa0, deg, w=weights)
        return (det0["soa"] - np.poly1d(coef)(det1["soa"])) / sample_rate

    return evaluate


def build_model_nearest(pairs, beacon_sdoa, sample_rate):
    """Difference against the single nearest beacon transmission."""
    if len(pairs) < 1:
        return None
    order = np.argsort([p[0]["timestamp"] for p in pairs])
    pairs = [pairs[i] for i in order]
    sdoa = np.asarray(beacon_sdoa)[order]
    times = [float(p[0]["timestamp"]) for p in pairs]

    def evaluate(det0, det1):
        idx = bisect.bisect_left(times, float(det0["timestamp"]))
        if idx > 0 and (idx == len(times)
                        or abs(det0["timestamp"] - times[idx - 1])
                        < abs(det0["timestamp"] - times[idx])):
            idx -= 1
        dsoa0 = det0["soa"] - pairs[idx][0]["soa"]
        dsoa1 = det1["soa"] - pairs[idx][1]["soa"]
        return (dsoa0 - dsoa1 + sdoa[idx]) / sample_rate

    return evaluate


def model_quality(pairs):
    """Beacon-pair SNR as a model confidence figure."""
    snr0 = np.array([(p[0]["energy"] / p[0]["noise"]) ** 2 for p in pairs])
    snr1 = np.array([(p[1]["energy"] / p[1]["noise"]) ** 2 for p in pairs])
    return (np.mean(snr0) + np.mean(snr1)) / 2


def estimate_tdoas(detections, matches, window_size, beacon_pos, rx_pos,
                   sample_rate, model_builder=build_model_poly,
                   model_params=None):
    """Estimate TDOAs for every mobile match group and receiver pair.

    Returns (tdoa_groups, failures).
    """
    model_params = model_params or {}
    beacon_matches = [m for m in matches
                      if int(detections[m[0]]["txid"]) in beacon_pos]
    mobile_matches = [(i, m) for i, m in enumerate(matches)
                      if int(detections[m[0]]["txid"]) not in beacon_pos]

    beacons = BeaconPairs(detections, beacon_matches)

    def expected_sdoa(rx0, rx1, beacon_id):
        return (_dist(rx_pos[rx0], beacon_pos[beacon_id])
                - _dist(rx_pos[rx1], beacon_pos[beacon_id])) \
            / SPEED_OF_LIGHT * sample_rate

    # Clock models depend only on the beacon window; consecutive mobile
    # groups usually share it, so fitted models are memoized per window
    # (a ~10x speedup at production detection rates).
    model_cache = {}

    groups, failures = [], []
    for group_idx, group in mobile_matches:
        tdoas = []
        group_ts = float(detections[group[0]]["timestamp"])
        tx = int(detections[group[0]]["txid"])
        for i0, i1 in itertools.combinations(group, 2):
            if detections[i0]["rxid"] > detections[i1]["rxid"]:
                i0, i1 = i1, i0
            det0, det1 = detections[i0], detections[i1]
            rx0, rx1 = int(det0["rxid"]), int(det1["rxid"])

            pairs, window_key = beacons.extract(
                rx0, rx1,
                float(det0["timestamp"]) - window_size,
                float(det0["timestamp"]) + window_size)
            if window_key in model_cache:
                model, quality = model_cache[window_key]
            else:
                sdoa = [expected_sdoa(rx0, rx1, int(p[0]["txid"]))
                        for p in pairs]
                model = model_builder(pairs, sdoa, sample_rate,
                                      **model_params)
                quality = model_quality(pairs) if model is not None \
                    else 0.0
                if window_key is not None:
                    model_cache[window_key] = (model, quality)
            if model is None:
                failures.append((i0, i1))
                continue
            tdoa = model(det0, det1)
            if tdoa is None or abs(tdoa) >= MAX_TDOA:
                failures.append((i0, i1))
                continue
            snr = ((det0["energy"] / det0["noise"]) ** 2
                   + (det1["energy"] / det1["noise"]) ** 2) / 2
            tdoas.append((rx0, rx1, tdoa, snr, quality, i0, i1))
        if tdoas:
            groups.append(TdoaGroup(
                group_id=group_idx, timestamp=group_ts, tx=tx,
                tdoas=np.array(tdoas, dtype=TDOA_DTYPE)))
    return groups, failures


# -- file formats ------------------------------------------------------------

def save_tdoa_groups(stream_or_path, groups):
    """Write .tdoa lines: group_id ts tx rx0 rx1 tdoa_ns snr quality i0 i1."""
    if isinstance(stream_or_path, str):
        with open(stream_or_path, "w") as f:
            return save_tdoa_groups(f, groups)
    f = stream_or_path
    for g in groups:
        for t in g.tdoas:
            f.write("{} {:.6f} {} {} {} {!r} {!r} {!r} {} {}\n".format(
                g.group_id, g.timestamp, g.tx, int(t["rx0"]), int(t["rx1"]),
                float(t["tdoa"]) * 1e9, float(t["snr"]),
                float(t["model_quality"]),
                int(t["det0_idx"]), int(t["det1_idx"])))


def load_tdoa_groups(stream_or_path):
    """Read a .tdoa file back into TdoaGroup objects (tdoa in seconds)."""
    if isinstance(stream_or_path, str):
        with open(stream_or_path) as f:
            return load_tdoa_groups(f)
    rows = []
    for line in stream_or_path:
        if not line.strip() or line[0] == "#":
            continue
        p = line.split()
        rows.append((int(p[0]), float(p[1]), int(p[2]), int(p[3]),
                     int(p[4]), float(p[5]) / 1e9, float(p[6]),
                     float(p[7]), int(p[8]), int(p[9])))
    groups = collections.OrderedDict()
    for row in rows:
        gid = row[0]
        if gid not in groups:
            groups[gid] = TdoaGroup(group_id=gid, timestamp=row[1],
                                    tx=row[2], tdoas=[])
        groups[gid].tdoas.append(row[3:])
    return [
        g._replace(tdoas=np.array(
            [tuple(t) for t in g.tdoas], dtype=TDOA_DTYPE))
        for g in groups.values()
    ]


def load_pos_config(stream_or_path):
    """Parse an ``id: x y [z]`` coordinate config."""
    if isinstance(stream_or_path, str):
        with open(stream_or_path) as f:
            return load_pos_config(f)
    strings = parse_kv_config(stream_or_path)
    return {int(k): np.array([float(x) for x in v.split()])
            for k, v in strings.items()}


def _main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("toads", nargs="?", type=str, default="data.toads")
    parser.add_argument("matches", nargs="?", type=str,
                        default="data.match")
    parser.add_argument("-o", "--output", type=str, default="data.tdoa")
    parser.add_argument("-r", "--rx-coordinates", dest="rx_pos",
                        type=str, default="pos-rx.cfg")
    parser.add_argument("-b", "--beacon-coordinates", dest="beacon_pos",
                        type=str, default="pos-beacon.cfg")
    parser.add_argument("-w", "--window-size", type=float, default=8,
                        help="beacon eligibility window (s) [default: 8]")
    parser.add_argument("-s", "--sample-rate", type=float, default=2.4e6)
    args = parser.parse_args(argv)

    detections = toad.load_toads(
        sys.stdin if args.toads == "-" else args.toads)
    matches = matchmaker.load_matches(args.matches)
    rx_pos = load_pos_config(args.rx_pos)
    beacon_pos = load_pos_config(args.beacon_pos)
    groups, failures = estimate_tdoas(
        detections, matches, args.window_size, beacon_pos, rx_pos,
        args.sample_rate)
    print("Number of TDOA estimations:", len(groups))
    print("Number of TDOA estimation failures:", len(failures))
    if args.output == "-":
        save_tdoa_groups(sys.stdout, groups)
    else:
        save_tdoa_groups(args.output, groups)


if __name__ == "__main__":
    _main()
