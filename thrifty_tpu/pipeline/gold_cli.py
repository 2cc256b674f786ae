"""CLI: generate Gold codes and print sequence statistics."""

from __future__ import annotations

import argparse

from thrifty_tpu.dsp import gold


def _main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("length", type=int,
                        help="register length -- code length will be 2^n-1")
    parser.add_argument("index", nargs="?", type=int, default=0,
                        help="which Gold code of the family to generate")
    parser.add_argument("--stats", action="store_true",
                        help="print autocorrelation stats instead of bits")
    args = parser.parse_args(argv)

    seq = gold.gold(args.length, args.index)
    if args.stats:
        stats = gold.autocorr_stats(seq)
        print("Peak amplitude: {:.0f}".format(stats["peak"]))
        print("Largest non-peak amplitude: {:.0f}".format(
            stats["max_sidelobe"]))
        print("Peak-to-max: {:.2f}".format(stats["peak_to_max"]))
        print("Peak-to-noise: {:.2f}".format(stats["peak_to_noise"]))
    else:
        print(" ".join(str(int(b)) for b in seq))


if __name__ == "__main__":
    _main()
