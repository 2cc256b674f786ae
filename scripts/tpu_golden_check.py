"""Golden cross-validation ON THE REAL CHIP.

The committed golden tests (tests/test_golden_fastdet.py,
tests/test_golden_reference.py) run on the CPU backend; the TPU's FFT
is a different implementation, so this script re-runs `detect
--sync-mode integer` on the AMBIENT JAX backend (the tunneled TPU in
the dev environment, a locally attached chip in deployment) against
the same committed inputs and compares the .toad output to the
compiled C reference's (fastdet, fastdet/corr_detector.cpp:31-197).

Prints one JSON line per receiver plus a summary line:
    {"metric": "tpu_golden_check", "value": 1.0, ...}
Exit 0 iff every detection decision, block index, peak sample and
template choice is identical and float columns are within tolerance.

Usage:  python scripts/tpu_golden_check.py [--tol-scale 10]

The float tolerances default to 10x the CPU goldens' (the TPU FFT's
f32 accumulation differs more than FFTW-vs-pocketfft); decisions must
match exactly regardless.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, "tests", "golden")
INPUT = os.path.join(GOLDEN, "input")
FASTDET = os.path.join(GOLDEN, "fastdet")

# Same column map as tests/test_golden_fastdet.py: exact integers
# (rxid, txid/carrier bin, peak sample, template) and toleranced
# floats (SoA, offsets, energies, noises).
INT_COLS = (0, 2, 4, 8)
FLOAT_TOLS = {3: dict(atol=1e-4), 5: dict(atol=1e-4),
              6: dict(rtol=1e-4), 7: dict(rtol=1e-4),
              9: dict(atol=1e-4), 10: dict(rtol=1e-4),
              11: dict(rtol=1e-4)}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--tol-scale", type=float, default=10.0,
                        help="multiply the CPU-golden float tolerances "
                             "by this for the TPU FFT [10]")
    args = parser.parse_args(argv)

    import jax

    # Same escape hatch as the umbrella CLI: some environments force a
    # platform via site customization; this must be applied in-process
    # before the backend initializes.
    platform = os.environ.get("THRIFTY_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    from thrifty_tpu.cli import main as cli_main

    backend = jax.default_backend()
    all_ok = True
    with tempfile.TemporaryDirectory() as d:
        for rxid in (0, 1, 2):
            out = os.path.join(d, "rx%d.toad" % rxid)
            rc = cli_main([
                "detect", os.path.join(INPUT, "rx%d.card" % rxid),
                "-o", out, "--rxid", str(rxid), "--quiet",
                "--sync-mode", "integer", "--carrier-window", "7-110",
                "--template", os.path.join(INPUT, "template.npy")])
            if rc not in (0, None):
                print(json.dumps({"rx": rxid, "ok": False,
                                  "error": "detect rc=%s" % rc}))
                all_ok = False
                continue
            ref = np.atleast_2d(np.loadtxt(
                os.path.join(FASTDET, "rx%d_fastdet.toad" % rxid)))
            got = np.atleast_2d(np.loadtxt(out))
            report = {"rx": rxid, "detections": int(got.shape[0]),
                      "expected": int(ref.shape[0])}
            ok = got.shape == ref.shape
            if ok:
                for col in INT_COLS:
                    n_bad = int((got[:, col] != ref[:, col]).sum())
                    ok = ok and n_bad == 0
                    if n_bad:
                        report["int_col%d_mismatches" % col] = n_bad
                errs = {}
                for col, tol in FLOAT_TOLS.items():
                    scale = (tol.get("atol", 0)
                             + tol.get("rtol", 0) * np.abs(ref[:, col]))
                    err = float(np.max(np.abs(got[:, col] - ref[:, col])
                                       / np.maximum(scale, 1e-30)))
                    errs["col%d" % col] = round(err, 3)
                    ok = ok and err <= args.tol_scale
                # worst error in units of the CPU-golden tolerance
                report["max_err_in_cpu_tols"] = max(errs.values())
                report["per_col"] = errs
            report["ok"] = bool(ok)
            print(json.dumps(report))
            all_ok = all_ok and ok

    print(json.dumps({
        "metric": "tpu_golden_check",
        "value": 1.0 if all_ok else 0.0,
        "unit": "pass",
        "vs_baseline": 1.0 if all_ok else 0.0,
        "backend": backend,
        "tol_scale": args.tol_scale,
    }))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
