"""Every CLI subcommand must import cleanly and print help."""

import os
import subprocess
import sys

import pytest

from thrifty_tpu.cli import COMMANDS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("command", sorted(COMMANDS))
def test_help(command):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; from thrifty_tpu.cli import main; "
        "sys.exit(main(['help', {!r}]))".format(command)
    )
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=240)
    assert res.returncode == 0, (command, res.stderr[-500:])
    assert "usage" in res.stdout.lower() or "usage" in res.stderr.lower()
