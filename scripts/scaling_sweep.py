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
import time

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


def time_mesh(detector, num_rx, num_time, blocks_per_shard, iters,
              devices):
    """Chained per-step seconds for one mesh shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from thrifty_tpu.parallel import mesh as mesh_mod
    from thrifty_tpu.parallel import sharded

    m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time,
                           devices=devices[: num_rx * num_time])
    fn = sharded.make_stream_detector(detector, num_rx,
                                      blocks_per_shard, m)
    new_len = detector.new_len
    total = num_time * blocks_per_shard * new_len
    rng = np.random.default_rng(0)
    streams = [
        (rng.normal(size=(num_rx, total))
         + 1j * rng.normal(size=(num_rx, total))).astype(np.complex64)
        * 0.05
        for _ in range(2)
    ]

    @jax.jit
    def step(stream, carry):
        out = fn(stream + jax.lax.complex(carry * 1e-10,
                                          jnp.float32(0.0)))
        return out, jnp.sum(out["corr_energy"])

    dev = [sharded.shard_stream(s, m) for s in streams]
    carry = jnp.float32(0.0)
    out, carry = step(dev[0], carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for i in range(iters):
        out, carry = step(dev[i % 2], carry)
    jax.block_until_ready(carry)
    sec = (time.perf_counter() - t0) / iters
    samples = num_rx * total
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
        detector = BatchDetector(sim.make_template(),
                                 DetectorConfig(carrier_window=(7, 110)))
    else:
        detector = BatchDetector(
            template_mod.generate(5, 0, 2.0),
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
        sec, samples = time_mesh(detector, num_rx, num_time,
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
