"""CLI: capture raw IQ from an SDR via an external capture binary.

The reference spawns its native ``fastcard`` binary for capture
(thrifty/fastcard_capture.py:35-93); SDR hardware and librtlsdr are out
of scope for a TPU pod, so this wrapper drives any compatible capture
command (``--capture-cmd``, e.g. ``rtl_sdr`` or a recorded-file cat) and
forwards termination signals, writing the raw stream or .card output for
``thrifty-tpu detect`` to consume.
"""

from __future__ import annotations

import argparse
import shlex
import signal
import subprocess
import sys

from thrifty_tpu.config import settings as settings_mod
from thrifty_tpu.config.parsers import normalize_freq_range


def build_args(config, output=None):
    """Translate settings into fastcard-style CLI flags."""
    window = normalize_freq_range(
        config.carrier_window, config.sample_rate / config.block_size)
    thresh_c, thresh_s, thresh_d = config.carrier_threshold
    if thresh_d:
        print("warning: stddev threshold not supported by capture backends",
              file=sys.stderr)
    args = [
        "-i", "rtlsdr",
        "-s", str(config.sample_rate),
        "-f", str(config.tuner_freq),
        "-g", str(config.tuner_gain),
        "-b", str(config.block_size),
        "-h", str(config.block_history),
        "-w", "{}-{}".format(window[0], window[1]),
        "-t", "{}c{}s".format(thresh_c, thresh_s),
        "-k", str(config.capture_skip),
    ]
    if output:
        args += ["-o", output]
    return args


def _main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("-o", "--output", type=str, default=None,
                        help="output .card file")
    parser.add_argument("--capture-cmd", type=str, default="fastcard",
                        help="capture binary to spawn [default: fastcard]")
    keys = ["sample_rate", "tuner_freq", "tuner_gain", "block_size",
            "block_history", "carrier_window", "carrier_threshold",
            "capture_skip"]
    config, args = settings_mod.load_args(parser, keys, argv=argv)

    cmd = shlex.split(args.capture_cmd) + build_args(config, args.output)
    print("capture:", " ".join(cmd), file=sys.stderr)
    try:
        proc = subprocess.Popen(cmd)
    except FileNotFoundError:
        print("error: capture binary {!r} not found (SDR capture requires "
              "external hardware support)".format(cmd[0]), file=sys.stderr)
        return 1

    def forward(signum, frame):
        proc.send_signal(signal.SIGTERM)

    signal.signal(signal.SIGINT, forward)
    signal.signal(signal.SIGTERM, forward)
    return proc.wait()


if __name__ == "__main__":
    sys.exit(_main())
