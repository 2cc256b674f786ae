"""Multi-transmitter template-bank detection through the CLI surface."""

import os
import subprocess
import sys

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.dsp import iq, template as template_mod
from thrifty_tpu.io import card, toad

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; from thrifty_tpu.cli import main; "
        "sys.exit(main({!r}))".format(list(args))
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=540)


@pytest.fixture(scope="module")
def bank_world(tmp_path_factory):
    """A capture where two transmitters use different Gold codes."""
    d = tmp_path_factory.mktemp("bank")
    sps = 2.4e6 / 0.999707e6
    bank = template_mod.generate_bank(11, [0, 1, 2], sps)
    np.save(str(d / "bank.npy"), bank)

    # Build a stream with bursts of code 0 and code 2 (same carrier bin:
    # identification must come from the code, not the frequency).
    new_len = 16384 - 4920
    num_blocks = 32
    length = num_blocks * new_len
    bursts, truth = [], []
    for k, b in enumerate(range(2, num_blocks, 6)):
        code_idx = 0 if k % 2 == 0 else 2
        lag = 4920 + 3000
        pos = b * new_len - 4920 + lag
        bursts.append((pos, code_idx))
        truth.append((b, code_idx))

    rng = np.random.default_rng(0)
    stream = 0.03 * (rng.normal(size=length)
                     + 1j * rng.normal(size=length))
    for pos, code_idx in bursts:
        tpl = bank[code_idx]
        ook = sim.ook_from_template(tpl)
        n = np.arange(len(ook))
        stream[pos:pos + len(ook)] += (
            0.6 * ook * np.exp(2j * np.pi * 40 * n / 16384))
    blocks = sim.stream_to_blocks(stream, 16384, 4920).astype(np.complex64)
    idx = np.arange(len(blocks), dtype=np.int64)
    ts = 1.5e9 + idx * (new_len / 2.4e6)
    card.write_card(str(d / "rx.card"), ts, idx, iq.iq_to_raw(blocks))
    return d, truth


def test_bank_emit_txid(bank_world):
    d, truth = bank_world
    res = run_cli(["detect", "rx.card", "-o", "rx.toads", "--rxid", "0",
                   "--quiet", "--emit-txid",
                   "--template", "bank.npy",
                   "--carrier-window", "7 - 110",
                   "--batch-size", "16"], cwd=str(d))
    assert res.returncode == 0, res.stderr
    det = toad.load_toads(str(d / "rx.toads"))
    got = {int(r["block"]): int(r["txid"]) for r in det}
    for block, code_idx in truth:
        assert got.get(block) == code_idx, (
            "block {}: txid {} != {}".format(block, got.get(block),
                                             code_idx))


def test_emit_txid_requires_bank(bank_world):
    d, _ = bank_world
    np.save(str(d / "single.npy"), np.ones(100))
    res = run_cli(["detect", "rx.card", "--emit-txid",
                   "--template", "single.npy", "--quiet"], cwd=str(d))
    assert res.returncode != 0
    assert "template bank" in res.stderr
