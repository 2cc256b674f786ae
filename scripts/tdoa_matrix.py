#!/usr/bin/env python
"""Per receiver-pair TDOA count / mean / std tables from pipeline data.

Reads .toads + .match (+ beacon/rx coordinates), estimates TDOAs for
every receiver pair and prints a matrix of statistics per transmitter.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import matchmaker, tdoa as tdoa_mod


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("toads", nargs="?", default="data.toads")
    parser.add_argument("matches", nargs="?", default="data.match")
    parser.add_argument("-r", "--rx-coordinates", dest="rx_pos",
                        default="pos-rx.cfg")
    parser.add_argument("-b", "--beacon-coordinates", dest="beacon_pos",
                        default="pos-beacon.cfg")
    parser.add_argument("-w", "--window-size", type=float, default=4.0)
    parser.add_argument("-s", "--sample-rate", type=float, default=2.4e6)
    args = parser.parse_args(argv)

    detections = toad.load_toads(args.toads)
    matches = matchmaker.load_matches(args.matches)
    rx_pos = tdoa_mod.load_pos_config(args.rx_pos)
    beacon_pos = tdoa_mod.load_pos_config(args.beacon_pos)

    matched = {i for m in matches for i in m}
    print("# Detection counts:")
    print(" - total:    ", len(detections))
    print(" - matched:  ", len(matched))
    print(" - unmatched:", len(detections) - len(matched))
    print()

    # Per TX x RX tables over the matched detections (reference
    # scripts/tdoa_matrix.py:32-80 print_count_table/print_snr_table).
    mdet = detections[sorted(matched)]
    tab_rx = np.unique(mdet["rxid"])
    tab_tx = np.unique(mdet["txid"])
    counts = np.zeros((len(tab_tx), len(tab_rx)), dtype=np.int64)
    esum = np.zeros_like(counts, dtype=np.float64)
    for row in mdet:
        ti = int(np.searchsorted(tab_tx, row["txid"]))
        ri = int(np.searchsorted(tab_rx, row["rxid"]))
        counts[ti, ri] += 1
        esum[ti, ri] += row["energy"]

    def print_table(title, cells):
        print("# {}:".format(title))
        print("{:>12}".format("v TX / RX >")
              + "".join("{:>10}".format(r) for r in tab_rx))
        for i, tx in enumerate(tab_tx):
            print("{:>12}".format(tx)
                  + "".join("{:>10}".format(c) for c in cells[i]))
        print()

    print_table("Detection count table", counts)
    with np.errstate(invalid="ignore"):
        means = np.where(counts > 0, esum / np.maximum(counts, 1), 0.0)
    print_table("Mean corr peak amplitude table",
                means.astype(np.int64))

    groups, failures = tdoa_mod.estimate_tdoas(
        detections, matches, args.window_size, beacon_pos, rx_pos,
        args.sample_rate)
    print("# TDOA estimations: {} groups, {} failures\n".format(
        len(groups), len(failures)))

    c = tdoa_mod.SPEED_OF_LIGHT
    txids = sorted({g.tx for g in groups})
    rxids = sorted(rx_pos)
    for tx in txids:
        print("# TX {}:".format(tx))
        header = "{:>8}".format("rx\\rx") + "".join(
            "{:>22}".format("rx{}".format(r)) for r in rxids)
        print(header)
        for rx0 in rxids:
            row = "{:>8}".format("rx{}".format(rx0))
            for rx1 in rxids:
                a, b = sorted([rx0, rx1])
                vals = [
                    float(t["tdoa"]) * c
                    for g in groups if g.tx == tx
                    for t in g.tdoas
                    if int(t["rx0"]) == a and int(t["rx1"]) == b
                ]
                if rx0 == rx1 or not vals:
                    row += "{:>22}".format("-")
                else:
                    row += "{:>22}".format("n={} s={:.1f}m".format(
                        len(vals), float(np.std(vals))))
            print(row)
        print()


if __name__ == "__main__":
    sys.exit(main())
