#!/usr/bin/env python
"""SoA accuracy characterization: RMS error vs SNR.

Sweeps burst amplitude over a synthetic capture with fractional-sample
ground truth and reports, per SNR point, the detection rate and the
sub-sample SoA error of the batched detector (and optionally the
float64 oracle for comparison).  This is the framework's accuracy
acceptance evidence (BASELINE.md: "SoA agreement within the
SNR-dependent noise bound").
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sweep(amplitudes, num_blocks=24, noise_std=0.05, seed=0,
          sync_mode="fractional", with_oracle=False, cpu=False):
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from thrifty_tpu import sim
    from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
    from thrifty_tpu.dsp.util import snr_db

    template = sim.make_template()
    detector = BatchDetector(template, DetectorConfig(
        carrier_window=(7, 110), sync_mode=sync_mode))

    oracle = None
    if with_oracle:
        from thrifty_tpu.oracle.numpy_ref import (FastdetOracleDetector,
                                                  OracleDetector)
        oracle_cls = (OracleDetector if sync_mode == "fractional"
                      else FastdetOracleDetector)
        oracle = oracle_cls(template, carrier_window=(7, 110))

    rows = []
    for ampl in amplitudes:
        # frac_jitter: bursts land at FRACTIONAL sample positions
        # (band-limited delay), so expected_soa exercises the
        # sub-sample interpolators -- integer truth would score an
        # interpolator that always returns 0 as perfect.
        cap = sim.synth_capture(
            num_blocks=num_blocks, bursts_every=2, template=template,
            amplitude=float(ampl), noise_std=noise_std, seed=seed,
            quantize=True, frac_jitter=True)
        out = {k: np.asarray(v) for k, v in detector(cap.blocks).items()}
        soa = detector.soa(cap.indices, out["corr_sample"],
                           out["corr_offset"])
        errs, snrs, oracle_errs = [], [], []
        detected = 0
        for burst in cap.bursts:
            i = burst.block_idx
            if i < 0 or not out["detected"][i]:
                continue
            detected += 1
            errs.append(soa[i] - burst.expected_soa)
            snrs.append(snr_db(out["corr_energy"][i],
                               out["corr_noise"][i]))
            if oracle is not None:
                res = oracle.detect_block(cap.blocks[i])
                if res.detected:
                    oracle_soa = (cap.indices[i] * detector.new_len
                                  + res.corr_sample + res.corr_offset)
                    oracle_errs.append(oracle_soa - burst.expected_soa)
        row = {
            "amplitude": float(ampl),
            "bursts": len(cap.bursts),
            "detected": detected,
            "snr_db": float(np.mean(snrs)) if snrs else float("nan"),
            "soa_rms": float(np.sqrt(np.mean(np.square(errs))))
            if errs else float("nan"),
            "soa_max": float(np.max(np.abs(errs))) if errs else
            float("nan"),
        }
        if oracle is not None:
            row["oracle_rms"] = float(
                np.sqrt(np.mean(np.square(oracle_errs)))) \
                if oracle_errs else float("nan")
        rows.append(row)
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--amplitudes", type=str,
                        default="0.05,0.08,0.12,0.2,0.35,0.6,1.0")
    parser.add_argument("--blocks", type=int, default=24)
    parser.add_argument("--noise", type=float, default=0.05)
    parser.add_argument("--sync-mode", type=str, default="fractional")
    parser.add_argument("--with-oracle", action="store_true",
                        help="also run the float64 oracle detector on "
                             "each detected block and report its SoA "
                             "RMS for comparison")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args(argv)

    amplitudes = [float(a) for a in args.amplitudes.split(",")]
    rows = sweep(amplitudes, args.blocks, args.noise,
                 sync_mode=args.sync_mode, with_oracle=args.with_oracle,
                 cpu=args.cpu)
    header = "{:>10} {:>9} {:>9} {:>9} {:>12} {:>12}".format(
        "amplitude", "bursts", "detected", "SNR(dB)", "SoA RMS", "SoA max")
    if args.with_oracle:
        header += " {:>12}".format("oracle RMS")
    print(header)
    for r in rows:
        line = ("{amplitude:>10.3f} {bursts:>9} {detected:>9} "
                "{snr_db:>9.1f} {soa_rms:>12.4f} {soa_max:>12.4f}"
                .format(**r))
        if args.with_oracle:
            line += " {:>12.4f}".format(r["oracle_rms"])
        print(line)


if __name__ == "__main__":
    sys.exit(main())
