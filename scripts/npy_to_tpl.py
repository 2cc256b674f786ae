#!/usr/bin/env python
"""Convert a .npy template to the .tpl binary format (and back).

Usage: npy_to_tpl.py [template.npy [template.tpl]]
       npy_to_tpl.py --reverse template.tpl [template.npy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from thrifty_tpu.io import tpl


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", nargs="?", default=None)
    parser.add_argument("dest", nargs="?", default=None)
    parser.add_argument("--reverse", action="store_true",
                        help="convert .tpl back to .npy")
    args = parser.parse_args(argv)

    # Mode-aware default source: --reverse with the forward default
    # would parse template.npy AS a .tpl and overwrite it in place.
    source = args.source or (
        "template.tpl" if args.reverse else "template.npy")
    ext = ".npy" if args.reverse else ".tpl"
    dest = args.dest or os.path.splitext(source)[0] + ext
    if os.path.abspath(dest) == os.path.abspath(source):
        parser.error("source and destination are the same file: "
                     + source)
    print("{} -> {}".format(source, dest))
    if args.reverse:
        np.save(dest, tpl.load_tpl(source))
    else:
        tpl.save_tpl(dest, np.load(source))


if __name__ == "__main__":
    sys.exit(main())
