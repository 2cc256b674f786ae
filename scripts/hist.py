#!/usr/bin/env python
"""Histogram of raw 8-bit sample values over many blocks (ADC health
check: clipping / DC offset diagnosis).

Example:  hist.py data.bin --export hist.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from thrifty_tpu.config import settings as settings_mod
from thrifty_tpu.io import blocks as blocks_io


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", nargs="?", type=str, default="-")
    parser.add_argument("--export", type=str, default=None)
    config, args = settings_mod.load_args(
        parser, ["block_size", "block_history"], argv=argv)

    stream = sys.stdin.buffer if args.input == "-" \
        else open(args.input, "rb")
    hist = np.zeros(256, dtype=np.int64)
    for _, _, raw in blocks_io.raw_batches(
            stream, config.block_size, config.block_history, 64):
        hist += np.bincount(raw.ravel(), minlength=256)

    total = hist.sum()
    if total == 0:
        print("no data")
        return 1
    mean = np.sum(np.arange(256) * hist) / total
    print("samples: {}  mean: {:.2f}  min: {}  max: {}  clipped: {:.4%}"
          .format(total, mean, np.nonzero(hist)[0][0],
                  np.nonzero(hist)[0][-1],
                  (hist[0] + hist[255]) / total))

    if args.export:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.bar(np.arange(256), hist, width=1.0)
        ax.set_xlabel("sample value")
        fig.savefig(args.export)
        print("saved plot to", args.export)


if __name__ == "__main__":
    sys.exit(main())
