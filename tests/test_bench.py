"""bench.py runs end-to-end and prints the driver's JSON contract."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        ).strip()
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import runpy, sys; sys.argv = ['bench.py'] + {!r}; "
        "runpy.run_path({!r}, run_name='__main__')".format(
            list(args), os.path.join(REPO, "bench.py"))
    )
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=540)


def check_contract(stdout):
    line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    # Driver contract: the four core keys, on one JSON line.  The
    # artifact additionally self-diagnoses (per-run times, config,
    # relay heuristic) so a low value is distinguishable from a
    # degraded-relay session (VERDICT r2 weak #1).
    assert set(data) >= {"metric", "value", "unit", "vs_baseline"}
    assert data["metric"] == "detect_throughput"
    assert data["unit"] == "IQ_samples/s/chip"
    assert data["value"] > 0
    assert data["vs_baseline"] > 0
    assert data["relay_degraded"] in (False, True)
    assert len(data["runs_sec_per_batch"]) >= 1
    assert all(r > 0 for r in data["runs_sec_per_batch"])
    assert {"batch", "iters", "sync_mode", "pallas", "input"} <= set(data)
    return data


def test_bench_default_contract():
    res = run_bench(["--batch", "8", "--iters", "2",
                     "--oracle-blocks", "2"])
    assert res.returncode == 0, res.stderr[-2000:]
    check_contract(res.stdout)


def test_bench_c64_and_modes():
    res = run_bench(["--batch", "8", "--iters", "2", "--skip-baseline",
                     "--input", "c64", "--sync-mode", "integer"])
    assert res.returncode == 0, res.stderr[-2000:]
    check_contract(res.stdout)


def test_bench_stream_program():
    res = run_bench(["--batch", "8", "--iters", "2", "--skip-baseline",
                     "--program", "stream"])
    assert res.returncode == 0, res.stderr[-2000:]
    check_contract(res.stdout)


@pytest.mark.parametrize("kind", ["raw", "card", "ingest"])
def test_bench_e2e_program(kind):
    res = run_bench(["--program", "e2e", "--batch", "8",
                     "--e2e-bytes", "3e6", "--input", kind,
                     "--skip-baseline"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert data["metric"] == "e2e_throughput_" + kind
    assert data["unit"] == "IQ_samples/s"
    assert data["value"] > 0
    assert data["vs_baseline"] > 0
    assert data["blocks"] > 0
    assert data["drain"] in ("host", "device-only")
    if kind == "ingest":
        # The ingest ceiling must pump the RAW stream format: 3e6
        # bytes // (8-block chunks of 2*new_len bytes each) -> exactly
        # 16 chunks of 8 blocks (a .card-format file, the old bug,
        # yields a different block count from its base64 expansion).
        new_bytes = 2 * (16384 - 4920)
        chunks = int(3e6) // (8 * new_bytes)
        assert data["blocks"] == 8 * chunks


def test_bench_serve_program():
    res = run_bench(["--program", "serve"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["metric"] == "serve_throughput"
    assert data["unit"] == "fixes/s"
    assert data["value"] > 0
    assert data["vs_baseline"] > 0


def test_selfcheck_program():
    """Pallas-vs-XLA on-device equivalence program: passes on CPU
    (kernel path vs straight-line XLA path in one jitted program)."""
    res = run_bench(["--program", "selfcheck", "--batch", "16"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert data["metric"] == "pallas_xla_selfcheck"
    assert data["value"] == 1.0
    d = data["field_diffs"]
    assert d["detected"] == 0 and d["corr_sample"] == 0
    assert d["corr_offset"] <= 1e-3


def test_selfcheck_wide_program():
    """--wide sweeps the widened kernel surface (alt interpolators,
    stddev threshold terms) through the same scalar-reduction check."""
    res = run_bench(["--program", "selfcheck", "--batch", "16", "--wide"])
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert data["value"] == 1.0 and data["wide"] is True
    d = data["field_diffs"]
    for cfg in ("parabolic_polyfit", "autocorr_integer", "maximise",
                "stddev"):
        assert d[cfg + ":detected"] == 0, cfg
        assert d[cfg + ":corr_sample"] == 0, cfg
