"""Driver contract: entry() compiles and dryrun_multichip runs."""

import sys
import os

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    detected = np.asarray(out["detected"])
    assert detected.shape == (args[0].shape[0],)
    # The example capture contains bursts: at least one detection.
    assert detected.any()


@pytest.mark.parametrize("n", [8, 4, 2, 1])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)
