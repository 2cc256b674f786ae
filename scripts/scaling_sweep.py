#!/usr/bin/env python
"""Mesh scaling sweep: streaming-detect throughput vs device count.

Runs the halo-exchange streaming detector over growing (rx, time)
meshes and reports per-shape step time, aggregate throughput, and
scaling efficiency relative to the single-device run.  This is the
tool to run on a real pod (where ICI carries the ppermute halos); on
the tunneled single-chip dev environment it can only be validated
functionally (`JAX_PLATFORMS=cpu` + virtual devices -- see
docs/performance.md "multi-chip" section for why SPMD cannot be timed
through the tunnel).

Timing uses the same data-dependent chain as bench.py (the carry
perturbs the next iteration's input with a value visible in float32),
so steps cannot overlap or be cached behind the runtime's back.

Usage:
  # functional smoke on 8 virtual CPU devices
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/scaling_sweep.py --platform cpu --geometry tiny

  # on a pod
  python scripts/scaling_sweep.py --geometry full --iters 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_shapes(text, n_avail):
    """'1x1,1x2,2x2' -> [(1,1),(1,2),(2,2)]; default: powers of two."""
    if text:
        shapes = []
        for part in text.split(","):
            rx, _, t = part.lower().partition("x")
            shapes.append((int(rx), int(t)))
        return shapes
    shapes = []
    n = 1
    while n <= n_avail:
        shapes.append((1, n))
        if n >= 4 and n % 2 == 0:
            shapes.append((2, n // 2))
        n *= 2
    return shapes


def time_mesh(detector, template, num_rx, num_time, blocks_per_shard,
              iters, devices):
    """Chained per-step seconds for one mesh shape.

    Uses bench.py's shared `time_stream_mesh` timer with burst-bearing
    captures: the data-dependent chain's 1e-10 perturbation factor is
    calibrated against a corr-energy carry of ~1e5-1e6, which only
    burst-bearing inputs produce (pure noise would leave the chain
    perturbation below float32 visibility).
    """
    import numpy as np

    import bench

    from thrifty_tpu.parallel import mesh as mesh_mod

    m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time,
                           devices=devices[: num_rx * num_time])
    total_blocks = num_time * blocks_per_shard
    new_len = detector.new_len
    total = total_blocks * new_len
    tpl = np.asarray(template, dtype=np.complex64)
    streams = []
    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        s = (rng.normal(size=(num_rx, total))
             + 1j * rng.normal(size=(num_rx, total))
             ).astype(np.complex64) * 0.05
        # Splice a template copy into every block so the corr-energy
        # carry is large in every shard/iteration.
        for b in range(total_blocks):
            pos = b * new_len
            end = min(pos + len(tpl), total)
            s[:, pos:end] += 0.6 * tpl[: end - pos]
        streams.append(s)

    sec = bench.time_stream_mesh(detector, streams, m,
                                 blocks_per_shard, iters)
    samples = num_rx * num_time * blocks_per_shard * detector.new_len
    return sec, samples


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--shapes", type=str, default=None,
                        help="comma list of RXxTIME mesh shapes "
                             "[default: power-of-two sweep]")
    parser.add_argument("--geometry", choices=["tiny", "full"],
                        default="full",
                        help="'full': 16384/4920 example geometry; "
                             "'tiny': 256/64 wiring check")
    parser.add_argument("--blocks-per-shard", type=int, default=4)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a JAX platform (e.g. cpu)")
    parser.add_argument("--json", type=str, default=None,
                        help="also write results to this JSON file")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)


    from thrifty_tpu import sim
    from thrifty_tpu.dsp import template as template_mod
    from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig

    if args.geometry == "full":
        template = sim.make_template()
        detector = BatchDetector(template,
                                 DetectorConfig(carrier_window=(7, 110)))
    else:
        template = template_mod.generate(5, 0, 2.0)
        detector = BatchDetector(
            template,
            DetectorConfig(block_len=256, history_len=64,
                           carrier_window=(4, 60), gn_iters=4))

    devices = jax.devices()
    shapes = [s for s in parse_shapes(args.shapes, len(devices))
              if s[0] * s[1] <= len(devices)]
    print("# platform={} devices={} geometry={}".format(
        jax.default_backend(), len(devices), args.geometry),
        file=sys.stderr)

    results = []
    base_rate_per_dev = None
    for num_rx, num_time in shapes:
        n = num_rx * num_time
        sec, samples = time_mesh(detector, template, num_rx, num_time,
                                 args.blocks_per_shard, args.iters,
                                 devices)
        rate = samples / sec
        if base_rate_per_dev is None:
            base_rate_per_dev = rate / n
        eff = rate / (n * base_rate_per_dev)
        row = {"mesh": "{}x{}".format(num_rx, num_time), "devices": n,
               "sec_per_step": round(sec, 6),
               "samples_per_s": round(rate, 1),
               "efficiency": round(eff, 3)}
        results.append(row)
        print("{mesh:>6}  n={devices:<3d} {sec_per_step:>10.6f} s/step  "
              "{samples_per_s:>14.4g} samples/s  eff={efficiency:.2f}"
              .format(**row))

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"geometry": args.geometry,
                       "platform": jax.default_backend(),
                       "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
