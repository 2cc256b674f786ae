"""Unique-window boundary cases (SURVEY.md section 7 'halo exchange
correctness').

The unique-lag window guarantees the true correlation peak appears in
exactly one block.  The *shoulder* of a peak sitting just outside a
neighbouring block's window can still clear the threshold at high SNR
(in the reference too) -- duplicate removal is the designed safety net
(thrifty/identify.py:134-164).  The invariant tested here: after
dedup, exactly one detection survives, in the predicted block, with the
correct SoA.
"""

import numpy as np
import pytest

from thrifty_tpu import sim
from thrifty_tpu.dsp import template as template_mod, xcorr
from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
from thrifty_tpu.io import toad
from thrifty_tpu.pipeline import identify

BLOCK, HISTORY = 1024, 160
TPL = template_mod.generate(5, 0, 2.0)  # 62 samples
NEW = BLOCK - HISTORY
WSTART, WSTOP = xcorr.corr_window(BLOCK, HISTORY, len(TPL))


def burst_stream(soa, num_blocks=8, seed=0):
    """Stream with one burst whose expected SoA is exactly ``soa``."""
    length = num_blocks * NEW
    return sim.synth_stream(
        length,
        [{"position": soa - HISTORY, "carrier_bin": 40.0,
          "amplitude": 0.8, "phase": 0.3}],
        TPL, BLOCK, noise_std=0.02, seed=seed)


def surviving_detections(out, soas, num_blocks):
    """Apply the dedup stage; return [(block, soa)] of survivors."""
    records = toad.from_detector_output(
        np.arange(num_blocks, dtype=np.float64),  # timestamps
        np.arange(num_blocks), soas, out, rxid=0)
    records["txid"] = 1
    keep = identify.duplicate_mask(records)
    return [(int(r["block"]), float(r["soa"])) for r in records[keep]]


@pytest.mark.parametrize("block_idx,lag", [
    (3, WSTART),            # first unique lag of block 3
    (3, WSTOP - 1),         # last unique lag
    (3, WSTART + NEW - 1),  # interior
    (4, WSTART),            # next block's first lag
])
def test_dedup_leaves_exactly_one_edge_detection(block_idx, lag):
    expected_soa = block_idx * NEW + lag
    blocks = sim.stream_to_blocks(
        burst_stream(expected_soa), BLOCK, HISTORY)
    det = BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110)))
    out = {k: np.asarray(v)
           for k, v in det(blocks.astype(np.complex64)).items()}
    soas = det.soa(np.arange(len(blocks)), out["corr_sample"],
                   out["corr_offset"])

    survivors = surviving_detections(out, soas, len(blocks))
    assert len(survivors) == 1, survivors
    got_block, got_soa = survivors[0]
    assert got_block == block_idx
    assert got_soa == pytest.approx(expected_soa, abs=0.1)


def test_true_peak_energy_dominates_shoulder():
    """The true block's detection always wins the energy comparison."""
    expected_soa = 3 * NEW + WSTART
    blocks = sim.stream_to_blocks(
        burst_stream(expected_soa), BLOCK, HISTORY)
    det = BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110)))
    out = {k: np.asarray(v)
           for k, v in det(blocks.astype(np.complex64)).items()}
    if out["detected"][2]:  # the shoulder, when it fires, is weaker
        assert out["corr_energy"][3] > out["corr_energy"][2]


def test_sharded_stream_agrees_at_edges():
    """The ppermute-halo streaming path yields identical edge behavior."""
    from thrifty_tpu.parallel import mesh as mesh_mod
    from thrifty_tpu.parallel import sharded

    num_time, per_shard = 4, 2
    total = num_time * per_shard
    # Peak at the first unique lag of the first block of time-shard 1:
    # its data lives partly in the halo received from shard 0.
    block_idx = per_shard
    expected_soa = block_idx * NEW + WSTART
    stream = burst_stream(expected_soa, num_blocks=total)[None, :]

    det = BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110)))

    # Reference: single-device batch path on the same blocks.
    blocks = sim.stream_to_blocks(stream[0], BLOCK, HISTORY)
    ref = {k: np.asarray(v)
           for k, v in det(blocks.astype(np.complex64)).items()}

    m = mesh_mod.make_mesh(num_rx=1, num_time=num_time)
    fn = sharded.make_stream_detector(det, 1, per_shard, m)
    out = {k: np.asarray(v)
           for k, v in fn(sharded.shard_stream(
               stream.astype(np.complex64), m)).items()}

    np.testing.assert_array_equal(out["detected"][0], ref["detected"])
    np.testing.assert_array_equal(out["corr_sample"][0],
                                  ref["corr_sample"])
    soas = det.soa(out["block_idx"][0], out["corr_sample"][0],
                   out["corr_offset"][0])
    survivors = surviving_detections(
        {k: v[0] for k, v in out.items() if k != "block_idx"},
        soas, total)
    assert len(survivors) == 1
    assert survivors[0][0] == block_idx
    assert survivors[0][1] == pytest.approx(expected_soa, abs=0.1)
