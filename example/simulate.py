#!/usr/bin/env python
"""Generate a synthetic three-receiver capture set for the example.

Writes cards/rx{0,1,2}.card plus freq-map.cfg / pos-rx.cfg /
pos-beacon.cfg matching the geometry below.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from thrifty_tpu import sim
from thrifty_tpu.dsp import iq
from thrifty_tpu.io import card

RX_POS = {
    0: np.array([0.0, 0.0]),
    1: np.array([9000.0, 500.0]),
    2: np.array([4000.0, 8000.0]),
}
BEACON_POS = {9: np.array([4500.0, 3000.0])}
MOBILE_POS = {3: np.array([6000.0, 2500.0])}
TX_BINS = {9: 30, 3: 70}


def main():
    history = 4920  # block_history: one value, used for BOTH the
    #                 capture synthesis and the raw-stream slicing
    #                 (must match detector.cfg's block_history)
    template = np.load("template.npy")
    schedule = [(9, t) for t in np.arange(0.02, 0.75, 0.05)]
    schedule += [(3, t) for t in np.arange(0.085, 0.75, 0.1)]
    captures = sim.synth_rx_captures(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, TX_BINS, schedule,
        template=template, num_blocks=160, history_len=history,
        amplitude=0.6, noise_std=0.04,
        clock_offsets={1: 777.25, 2: -123.5},
        clock_drifts={1: 3e-6, 2: -2e-6}, seed=20)

    os.makedirs("cards", exist_ok=True)
    os.makedirs("raw", exist_ok=True)
    for rxid, cap in captures.items():
        path = "cards/rx{}.card".format(rxid)
        card.write_card(path, cap.timestamps, cap.indices,
                        iq.iq_to_raw(cap.blocks),
                        header="synthetic capture rx{}".format(rxid))
        print("wrote", path)
        # The contiguous raw stream, for the capture-thinning demo
        # (make capture): each block's new samples concatenated.
        raw_path = "raw/rx{}.bin".format(rxid)
        iq.iq_to_raw(cap.blocks[:, history:].reshape(-1)).tofile(raw_path)
        print("wrote", raw_path)

    with open("freq-map.cfg", "w") as f:
        f.write("9: 25 - 35\n3: 65 - 75\n@0: 0\n@1: 0\n@2: 0\n")
    with open("pos-rx.cfg", "w") as f:
        for rxid, p in RX_POS.items():
            f.write("{}: {} {}\n".format(rxid, p[0], p[1]))
    with open("pos-beacon.cfg", "w") as f:
        for txid, p in BEACON_POS.items():
            f.write("{}: {} {}\n".format(txid, p[0], p[1]))
    print("wrote freq-map.cfg pos-rx.cfg pos-beacon.cfg")
    print("ground truth: mobile TX 3 at {}".format(MOBILE_POS[3]))


if __name__ == "__main__":
    main()
