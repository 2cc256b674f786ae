"""Match detections of the same transmission across receivers.

Greedy timestamp-window grouping (reference thrifty/matchmaker.py:17-79):
walk detections sorted by timestamp; all same-tx detections within
``window`` seconds of a seed detection form a group; per receiver the
strongest detection wins collisions; groups seen by at least
``min_match`` receivers are matches.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from thrifty_tpu.io import toad


def match_detections(detections, window=0.2, min_match=2):
    """Group detections into matches.

    ``detections`` must be sorted by timestamp (integrate() output is).

    Returns
    -------
    matches : list of list of int -- detection indices per group
    misses : list of int -- seed indices that matched < min_match RXs
    collisions : list of (int, int) -- same-RX collision pairs
    """
    ts = detections["timestamp"]
    tx = detections["txid"]
    rx = detections["rxid"]
    energy = detections["energy"]
    n = len(detections)

    # For each i, the first index beyond its window (vectorized bound).
    window_end = np.searchsorted(ts, ts + window, side="right")

    killed = np.zeros(n, dtype=bool)
    matches, misses, collisions = [], [], []

    for i in range(n):
        if killed[i]:
            continue
        rx_best = {int(rx[i]): i}
        for j in range(i + 1, int(window_end[i])):
            if tx[j] != tx[i]:
                continue
            killed[j] = True
            rxj = int(rx[j])
            prev = rx_best.get(rxj)
            if prev is not None:
                collisions.append((prev, j))
                if energy[prev] > energy[j]:
                    continue
            rx_best[rxj] = j
        group = list(rx_best.values())
        if len(group) >= min_match:
            matches.append(group)
        else:
            misses.append(i)

    return matches, misses, collisions


def save_matches(stream_or_path, matches):
    """Write a .match file: one line of detection indices per group."""
    if isinstance(stream_or_path, str):
        with open(stream_or_path, "w") as f:
            return save_matches(f, matches)
    for match in matches:
        stream_or_path.write(" ".join(str(int(m)) for m in match) + "\n")


def load_matches(stream_or_path):
    """Read a .match file."""
    if isinstance(stream_or_path, str):
        with open(stream_or_path) as f:
            return load_matches(f)
    matches = []
    for line in stream_or_path:
        if not line.strip() or line[0] == "#":
            continue
        matches.append([int(x) for x in line.split()])
    return matches


def match_matrix(detections, matches, rxids, txids=None):
    """Rows of per-RX detection indices for matches covering all rxids."""
    matrix = []
    for match in matches:
        match_rx = [int(detections[m]["rxid"]) for m in match]
        if txids is not None and \
                int(detections[match[0]]["txid"]) not in txids:
            continue
        if any(r not in match_rx for r in rxids):
            continue
        matrix.append([match[match_rx.index(r)] for r in rxids])
    return matrix


def _main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("input", nargs="?", type=str, default="data.toads",
                        help=".toads data ('-' streams from stdin)")
    parser.add_argument("-o", "--output", type=str, default="data.match",
                        help="output .match file ('-' for stdout)")
    parser.add_argument("-w", "--window", type=float, default=0.2,
                        help="timestamp window in seconds [default: 0.2]")
    parser.add_argument("-n", "--num-matches", type=int, default=2,
                        help="min receivers for a valid match [default: 2]")
    args = parser.parse_args(argv)

    stream = sys.stdin if args.input == "-" else args.input
    detections = toad.load_toads(stream)
    order = np.argsort(detections["timestamp"], kind="stable")
    detections = detections[order]
    matches, misses, collisions = match_detections(
        detections, args.window, args.num_matches)
    # Indices must refer to the file's line order, not the sorted order.
    matches = [[int(order[m]) for m in match] for match in matches]

    print("Number of matches:", len(matches))
    print("Number of misses:", len(misses))
    print("Number of collisions:", len(collisions))

    if args.output == "-":
        save_matches(sys.stdout, matches)
    else:
        save_matches(args.output, matches)


if __name__ == "__main__":
    _main()
