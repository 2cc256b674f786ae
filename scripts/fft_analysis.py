#!/usr/bin/env python
"""Mean |FFT| over many blocks of raw IQ data (batched), with the
strongest bins printed and an optional spectrum plot.

Example:  rtl_sdr -f 433.83M -s 2.4M -g 55 data.bin
          fft_analysis.py data.bin --export spectrum.png
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
    parser.add_argument("--top", type=int, default=5,
                        help="print the N strongest bins")
    parser.add_argument("--export", type=str, default=None)
    config, args = settings_mod.load_args(
        parser, ["block_size", "block_history", "sample_rate"], argv=argv)

    stream = sys.stdin.buffer if args.input == "-" \
        else open(args.input, "rb")
    fft_sum = np.zeros(config.block_size)
    count = 0
    for _, _, raw in blocks_io.raw_batches(
            stream, config.block_size, config.block_history,
            args.integrate):
        blocks = iq.raw_to_iq(raw)
        fft_sum += np.sum(np.abs(np.fft.fft(blocks, axis=-1)), axis=0)
        count += len(raw)
    if count == 0:
        print("no blocks read")
        return 1
    mean_fft = fft_sum / count

    bin_freq = config.sample_rate / config.block_size
    top = np.argsort(mean_fft)[::-1][:args.top]
    print("blocks integrated:", count)
    for b in top:
        signed = b if b <= config.block_size // 2 else b - config.block_size
        print("bin {:6d} ({:+.3f} kHz): {:.1f}".format(
            int(signed), signed * bin_freq / 1e3, mean_fft[b]))

    if args.export:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(10, 4))
        freqs = np.fft.fftshift(np.fft.fftfreq(
            config.block_size, 1.0 / config.sample_rate))
        ax.semilogy(freqs / 1e3, np.fft.fftshift(mean_fft), lw=0.4)
        ax.set_xlabel("frequency (kHz)")
        ax.set_ylabel("mean |FFT|")
        ax.grid(True)
        fig.savefig(args.export)
        print("saved plot to", args.export)


if __name__ == "__main__":
    sys.exit(main())
