#!/usr/bin/env python
"""End-to-end positioning-network demo on a device mesh.

Simulates N receivers observing beacon + mobile transmitters (IQ
level, drifting clocks), runs the sharded streaming detector over an
(rx, time) mesh with ppermute halo exchange and gathered detections,
then identify -> match -> tdoa -> batched least-squares positions, and
reports position error against the simulated ground truth.

Runs on whatever devices are available (forced-CPU virtual mesh with
--cpu; the driver-style invocation is `python scripts/network_demo.py
--cpu --devices 8`).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RX_POS = {
    0: np.array([0.0, 0.0]),
    1: np.array([9000.0, 500.0]),
    2: np.array([4000.0, 8000.0]),
    3: np.array([-2000.0, 5000.0]),
}
BEACON_POS = {9: np.array([4500.0, 3000.0])}
MOBILE_POS = {3: np.array([6000.0, 2500.0])}
TX_BINS = {9: 30, 3: 70}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--devices", type=int, default=8,
                        help="virtual device count with --cpu")
    parser.add_argument("--blocks", type=int, default=80)
    args = parser.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count={}".format(
                args.devices)).strip()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from thrifty_tpu import sim
    from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
    from thrifty_tpu.io import toad
    from thrifty_tpu.parallel import mesh as mesh_mod, sharded
    from thrifty_tpu.pipeline import kitchen_sink

    n_dev = len(jax.devices())
    # Fit the mesh to whatever devices exist: shard fewer receivers
    # per device row when the backend is small (1 device -> 1x1 mesh
    # with all receivers' streams on it), instead of crashing on a
    # mesh larger than the device count.
    num_rx = min(len(RX_POS), n_dev)
    num_time = max(n_dev // num_rx, 1)
    print("devices: {} -> mesh (rx={}, time={})".format(
        n_dev, num_rx, num_time))

    tpl = sim.make_template()
    schedule = [(9, t) for t in np.arange(0.02, 0.36, 0.05)]
    schedule += [(3, t) for t in (0.085, 0.185, 0.285)]
    total_blocks = args.blocks - args.blocks % num_time
    if total_blocks <= 0:
        parser.error("--blocks must be >= the mesh's time axis "
                     "({} devices -> num_time {})".format(
                         n_dev, num_time))
    caps = sim.synth_rx_captures(
        RX_POS, {**BEACON_POS, **MOBILE_POS}, TX_BINS, schedule,
        template=tpl, num_blocks=total_blocks, amplitude=0.6,
        noise_std=0.04,
        clock_offsets={1: 777.25, 2: -123.5, 3: 2001.75},
        clock_drifts={1: 3e-6, 2: -2e-6, 3: 1e-6}, seed=11)

    detector = BatchDetector(tpl, DetectorConfig(carrier_window=(7, 110)))

    # Sharded streaming detect with halo exchange + gathered table.
    history = detector.config.history_len
    streams = np.stack([
        np.concatenate([caps[r].blocks[b, history:]
                        for b in range(total_blocks)])
        for r in sorted(caps)])
    m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time)
    fn = sharded.make_stream_detector(
        detector, num_rx, total_blocks // num_time, m, gather=True)
    out = {k: np.asarray(v)
           for k, v in fn(sharded.shard_stream(
               streams.astype(np.complex64), m)).items()}
    print("sharded detect: {} detections across {} receivers".format(
        int(out["detected"].sum()), num_rx))

    # Assemble the gathered table into detection records.
    parts = []
    for ri, rxid in enumerate(sorted(caps)):
        soa = detector.soa(out["block_idx"][ri], out["corr_sample"][ri],
                          out["corr_offset"][ri])
        rec = toad.from_detector_output(
            caps[rxid].timestamps, out["block_idx"][ri], soa,
            {k: v[ri] for k, v in out.items() if k != "block_idx"},
            rxid=rxid)
        parts.append(rec)
    detections = np.concatenate(parts)

    freqmap = {r: {9: (25.0, 35.0), 3: (65.0, 75.0)} for r in RX_POS}
    settings = kitchen_sink.PostdetectSettings(
        freqmap=freqmap, match_window=0.02, tdoa_est_window=8.0,
        rx_pos=RX_POS, beacon_pos=BEACON_POS, sample_rate=2.4e6)
    result = kitchen_sink.postdetect(detections, settings)

    print("matches: {}; tdoa groups: {}; positions: {}".format(
        len(result.matches), len(result.tdoas), len(result.pos)))
    for row in result.pos:
        est = np.array([row["x"], row["y"]])
        err = np.linalg.norm(est - MOBILE_POS[3])
        print("  t={:.3f}  pos=({:8.1f},{:8.1f})  err={:6.2f} m  "
              "dop={:.2f}".format(row["timestamp"] % 1000, row["x"],
                                  row["y"], err, row["dop"]))
    errs = [np.linalg.norm(np.array([r["x"], r["y"]]) - MOBILE_POS[3])
            for r in result.pos]
    if errs:
        print("position RMS error: {:.2f} m".format(
            float(np.sqrt(np.mean(np.square(errs))))))
    else:
        print("no position fixes (need more --blocks for the beacon "
              "clock models)")


if __name__ == "__main__":
    sys.exit(main())
