"""CLI: run the detector throughput benchmark (see bench.py)."""

from __future__ import annotations

import sys
import importlib.util
import os


def _main(argv=None):
    # bench.py lives at the repo root (driver contract); load it by path.
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "bench.py")
    spec = importlib.util.spec_from_file_location("thrifty_tpu_bench", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module.main(argv)


if __name__ == "__main__":
    sys.exit(_main())
