#!/usr/bin/env python
"""Relative distance of a transmitter vs the nearest beacon transmission.

For a two-receiver pair, computes each mobile detection's SDOA relative
to the nearest (or linearly interpolated) beacon SDOA -- a quick-look
clock-sync-free ranging diagnostic.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from thrifty_tpu import stats
from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import matchmaker
from thrifty_tpu.pipeline.tdoa import SPEED_OF_LIGHT


def find_nearest(array, values):
    """Index of the nearest element of sorted `array` for each value."""
    idx = np.searchsorted(array, values)
    idx = np.clip(idx, 0, len(array) - 1)
    prev_ok = idx > 0
    prev = np.clip(idx - 1, 0, len(array) - 1)
    closer_prev = prev_ok & (
        np.abs(values - array[prev]) < np.abs(values - array[idx]))
    return np.where(closer_prev, prev, idx)


def pair_soa(detections, matches, rx0, rx1, txid):
    """[N, 2] SoA pairs for txid seen by both rx0 and rx1."""
    rows = []
    for m in matches:
        dets = detections[m]
        if dets["txid"][0] != txid:
            continue
        rxs = list(dets["rxid"])
        if rx0 in rxs and rx1 in rxs:
            rows.append((dets["soa"][rxs.index(rx0)],
                         dets["soa"][rxs.index(rx1)]))
    return np.asarray(rows)


def reldist_nearest(tx_soa, beacon_soa):
    nearest = find_nearest(beacon_soa[:, 0], tx_soa[:, 0])
    rel = tx_soa - beacon_soa[nearest]
    return rel[:, 1] - rel[:, 0]


def reldist_linear(tx_soa, beacon_soa):
    b0, b1 = beacon_soa[:, 0], beacon_soa[:, 1]
    hi = np.clip(np.searchsorted(b0, tx_soa[:, 0]), 1, len(b0) - 1)
    lo = hi - 1
    with np.errstate(divide="ignore", invalid="ignore"):
        w = (tx_soa[:, 0] - b0[lo]) / (b0[hi] - b0[lo])
    # Reference guard (scripts/reldist_nearest.py reldist_linpol:
    # weight[np.isinf(weight)] = 1): duplicate adjacent beacon SoAs
    # (or a single pair) give a zero denominator; fall back to the
    # 'hi' beacon instead of printing NaN statistics.
    w = np.where(np.isfinite(w), w, 1.0)
    return tx_soa[:, 1] - (b1[lo] * (1 - w) + b1[hi] * w)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("toads", nargs="?", default="data.toads")
    parser.add_argument("matches", nargs="?", default="data.match")
    parser.add_argument("--rx0", type=int, default=0)
    parser.add_argument("--rx1", type=int, default=1)
    parser.add_argument("--tx", type=int, required=True)
    parser.add_argument("--beacon", type=int, required=True)
    parser.add_argument("--mode", choices=["nearest", "linear"],
                        default="nearest")
    parser.add_argument("-s", "--sample-rate", type=float, default=2.4e6)
    parser.add_argument("--export", type=str, default=None)
    args = parser.parse_args(argv)

    detections = toad.load_toads(args.toads)
    matches = matchmaker.load_matches(args.matches)
    tx_soa = pair_soa(detections, matches, args.rx0, args.rx1, args.tx)
    beacon_soa = pair_soa(detections, matches, args.rx0, args.rx1,
                          args.beacon)
    if len(tx_soa) == 0 or len(beacon_soa) == 0:
        print("no matched detections for tx/beacon pair")
        return 1

    fn = reldist_nearest if args.mode == "nearest" else reldist_linear
    reldist = fn(tx_soa, beacon_soa)
    keep = ~stats.is_outlier(reldist)
    meters = reldist[keep] * SPEED_OF_LIGHT / args.sample_rate
    print("n={} ({} outliers)  mean={:.2f} m  std={:.2f} m".format(
        len(meters), int(np.sum(~keep)), np.mean(meters), np.std(meters)))

    if args.export:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot(tx_soa[keep, 0], meters, ".")
        if len(meters) >= 3:
            # Lowess trend overlay (reference reldist_nearest.py:223-225).
            smooth = stats.lowess(tx_soa[keep, 0], meters, frac=0.025)
            order = np.argsort(tx_soa[keep, 0])
            ax.plot(tx_soa[keep, 0][order], smooth[order], "-",
                    color="C1", label="lowess")
            ax.legend()
        ax.set_xlabel("SoA at rx{}".format(args.rx0))
        ax.set_ylabel("relative distance (m)")
        ax.grid(True)
        fig.savefig(args.export)
        print("saved plot to", args.export)


if __name__ == "__main__":
    sys.exit(main())
