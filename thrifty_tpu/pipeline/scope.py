"""CLI: live signal scope (stub).

The reference's scope (thrifty/scope.py) is a GNU Radio + Qt GUI tied to
local SDR hardware; neither exists on a TPU host.  Offline equivalents
of its views live in ``thrifty-tpu analyze_detect`` (spectrum, IQ,
correlation plots from captures).
"""

from __future__ import annotations

import sys


def _main(argv=None):
    print("thrifty-tpu scope: live SDR scope requires GNU Radio + local "
          "SDR hardware, which this TPU build does not target.\n"
          "Use 'thrifty-tpu analyze_detect <capture.card>' for offline "
          "signal views.", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(_main())
