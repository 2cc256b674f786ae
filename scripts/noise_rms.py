#!/usr/bin/env python
"""Print the RMS value of blocks of raw IQ data, integrated over groups.

Example:  rtl_sdr -f 433.83M -s 2.4M -g 55 - | noise_rms.py -
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from thrifty_tpu.config import settings as settings_mod
from thrifty_tpu.dsp import iq
from thrifty_tpu.io import blocks as blocks_io


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", nargs="?", type=str, default="-")
    parser.add_argument("-i", "--integrate", type=int, default=100,
                        help="number of blocks to integrate over")
    config, args = settings_mod.load_args(
        parser, ["block_size", "block_history"], argv=argv)

    stream = sys.stdin.buffer if args.input == "-" \
        else open(args.input, "rb")
    for _, _, raw in blocks_io.raw_batches(
            stream, config.block_size, config.block_history,
            args.integrate):
        blocks = iq.raw_to_iq(raw)
        rms = np.sqrt(np.sum(np.abs(blocks) ** 2, axis=-1))
        print(np.mean(rms))


if __name__ == "__main__":
    sys.exit(main())
