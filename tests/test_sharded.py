"""Sharded detection on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax

from thrifty_tpu import sim
from thrifty_tpu.dsp import gold, template
from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
from thrifty_tpu.parallel import mesh as mesh_mod
from thrifty_tpu.parallel import sharded


# Small geometry so CPU tests stay fast: 5-bit gold code, 2 sps.
BLOCK, HISTORY = 1024, 160
TPL = template.generate(5, 0, 2.0)  # 62 samples


def small_capture(num_blocks, seed=0, bursts_every=3):
    return sim.synth_capture(
        num_blocks=num_blocks, bursts_every=bursts_every, template=TPL,
        block_len=BLOCK, history_len=HISTORY, carrier_bin=40.25,
        amplitude=0.8, noise_std=0.05, seed=seed, quantize=False)


@pytest.fixture(scope="module")
def detector():
    return BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110)))


def test_mesh_construction():
    m = mesh_mod.make_mesh(num_rx=2)
    assert m.shape == {"rx": 2, "time": 4}
    m2 = mesh_mod.make_mesh(num_rx=1, num_time=8)
    assert m2.shape == {"rx": 1, "time": 8}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(num_rx=3)


def test_batch_sharded_matches_single_device(detector):
    cap = small_capture(16)
    m = mesh_mod.make_mesh(num_rx=2, num_time=4)
    fn = sharded.batch_detect_sharded(detector, m)
    ref = {k: np.asarray(v) for k, v in detector(cap.blocks).items()}
    got = {k: np.asarray(v) for k, v in fn(cap.blocks).items()}
    for k in ref:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=2e-4, atol=2e-4, err_msg=k)


def test_stream_halo_exchange_matches_host_unfold(detector):
    """Device-side ppermute halo + unfold == host overlap-save blocks."""
    num_rx, num_time, s_loc = 2, 4, 4
    total_blocks = num_time * s_loc
    new_len = BLOCK - HISTORY
    m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time)

    caps = [small_capture(total_blocks, seed=i) for i in range(num_rx)]
    # Rebuild the contiguous new-sample streams the devices will unfold.
    streams = np.stack([
        np.concatenate([c.blocks[b, HISTORY:] for b in range(total_blocks)])
        for c in caps])
    assert streams.shape == (num_rx, total_blocks * new_len)

    fn = sharded.make_stream_detector(detector, num_rx, s_loc, m)
    out = {k: np.asarray(v)
           for k, v in fn(sharded.shard_stream(streams, m)).items()}

    for r, cap in enumerate(caps):
        ref = {k: np.asarray(v) for k, v in detector(cap.blocks).items()}
        np.testing.assert_array_equal(out["block_idx"][r],
                                      np.arange(total_blocks))
        np.testing.assert_array_equal(
            out["detected"][r], ref["detected"])
        np.testing.assert_array_equal(
            out["corr_sample"][r], ref["corr_sample"])
        np.testing.assert_allclose(
            out["corr_offset"][r], ref["corr_offset"], atol=2e-4)
        np.testing.assert_allclose(
            out["carrier_offset"][r], ref["carrier_offset"], atol=2e-4)


def test_stream_detects_bursts(detector):
    num_rx, num_time, s_loc = 1, 8, 3
    total_blocks = num_time * s_loc
    m = mesh_mod.make_mesh(num_rx=1, num_time=8)
    cap = small_capture(total_blocks, seed=5)
    new_len = BLOCK - HISTORY
    stream = np.concatenate(
        [cap.blocks[b, HISTORY:] for b in range(total_blocks)])[None, :]

    fn = sharded.make_stream_detector(detector, num_rx, s_loc, m)
    out = {k: np.asarray(v)
           for k, v in fn(sharded.shard_stream(stream, m)).items()}
    soa = detector.soa(out["block_idx"][0],
                       out["corr_sample"][0], out["corr_offset"][0])
    for burst in cap.bursts:
        i = burst.block_idx
        assert out["detected"][0][i]
        assert abs(soa[i] - burst.expected_soa) < 0.05


def test_gspmd_stream_matches_shard_map(detector):
    """The annotation-driven program equals the explicit shard_map one."""
    num_rx, num_time, s_loc = 2, 4, 4
    total = num_time * s_loc
    m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time)
    caps = [small_capture(total, seed=i) for i in range(num_rx)]
    streams = np.stack([
        np.concatenate([c.blocks[b, HISTORY:] for b in range(total)])
        for c in caps]).astype(np.complex64)

    sm = sharded.make_stream_detector(detector, num_rx, s_loc, m)
    gs = sharded.make_stream_detector_gspmd(detector, total, m)
    dev = sharded.shard_stream(streams, m)
    out_sm = {k: np.asarray(v) for k, v in sm(dev).items()}
    out_gs = {k: np.asarray(v) for k, v in gs(dev).items()}
    for k in out_sm:
        np.testing.assert_allclose(
            out_gs[k], out_sm[k], atol=2e-4, err_msg=k)


def test_full_geometry_halo(detector):
    """Halo exchange at the real example geometry (16384/4920/4914)."""
    from thrifty_tpu import sim as sim_mod

    tpl = sim_mod.make_template()
    full_det = BatchDetector(tpl, DetectorConfig(carrier_window=(7, 110)))
    new_len = full_det.new_len
    num_time, per_shard = 2, 4
    total = num_time * per_shard
    cap = sim_mod.synth_capture(
        num_blocks=total, bursts_every=3, template=tpl, quantize=False,
        seed=2)
    stream = np.concatenate(
        [cap.blocks[b, 4920:] for b in range(total)])[None, :]

    m = mesh_mod.make_mesh(num_rx=1, num_time=num_time)
    fn = sharded.make_stream_detector(full_det, 1, per_shard, m)
    out = {k: np.asarray(v)
           for k, v in fn(sharded.shard_stream(
               stream.astype(np.complex64), m)).items()}
    ref = {k: np.asarray(v) for k, v in full_det(cap.blocks).items()}
    np.testing.assert_array_equal(out["detected"][0], ref["detected"])
    np.testing.assert_array_equal(out["corr_sample"][0],
                                  ref["corr_sample"])
    # The shard-1 blocks depend on shard-0's halo; SoAs must line up.
    soa = full_det.soa(out["block_idx"][0], out["corr_sample"][0],
                       out["corr_offset"][0])
    for burst in cap.bursts:
        i = burst.block_idx
        if i >= 0 and ref["detected"][i]:
            assert abs(soa[i] - burst.expected_soa) < 0.05


def test_stream_gather_replicates(detector):
    num_rx, num_time, s_loc = 2, 4, 4
    m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time)
    cap = small_capture(num_time * s_loc)
    new_len = BLOCK - HISTORY
    stream = np.concatenate(
        [cap.blocks[b, HISTORY:] for b in range(num_time * s_loc)])
    streams = np.stack([stream, stream])
    fn = sharded.make_stream_detector(detector, num_rx, s_loc, m,
                                      gather=True)
    out = fn(sharded.shard_stream(streams, m))
    detected = np.asarray(out["detected"])
    assert detected.shape == (num_rx, num_time * s_loc)
    # Both receivers saw the same stream.
    np.testing.assert_array_equal(detected[0], detected[1])


def test_random_geometry_sharded_equality():
    """Randomized (template, block, history) geometries x mesh shapes:
    the halo-exchange streaming program must equal the single-device
    detector on the same blocks.  Catches halo/unfold/tiling bugs at
    shapes the fixed-geometry tests (and the production-geometry
    dryrun) never visit."""
    rng = np.random.default_rng(20260820)
    mesh_shapes = [(2, 4), (1, 8), (4, 2)]
    trials = 0
    while trials < 3:
        bits = int(rng.integers(5, 7))
        tpl = template.generate(bits, 0, float(rng.uniform(1.8, 2.4)))
        tlen = len(tpl)
        block = int(2 ** rng.integers(9, 12))
        lo, hi = tlen + 1, block // 2
        if lo >= hi:
            continue
        hist = int(rng.integers(lo, hi))
        num_rx, num_time = mesh_shapes[trials]
        s_loc = int(rng.integers(2, 4))
        total_blocks = num_time * s_loc
        try:
            caps = [sim.synth_capture(
                num_blocks=total_blocks, bursts_every=2, template=tpl,
                block_len=block, history_len=hist,
                carrier_bin=float(min(40, block // 30)) + 0.25,
                amplitude=0.8, noise_std=0.05, seed=100 + r,
                quantize=False) for r in range(num_rx)]
        except ValueError:
            continue  # burst placement infeasible at this geometry
        trials += 1
        m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time)
        det = BatchDetector(tpl, DetectorConfig(
            block_len=block, history_len=hist,
            carrier_window=(3, max(block // 20, 5))))
        streams = np.stack([
            np.concatenate([c.blocks[b, hist:]
                            for b in range(total_blocks)])
            for c in caps])
        fn = sharded.make_stream_detector(det, num_rx, s_loc, m)
        dev = sharded.shard_stream(streams, m)
        out = {k: np.asarray(v) for k, v in fn(dev).items()}
        geom = "trial=%d bits=%d block=%d hist=%d mesh=%dx%d" % (
            trials, bits, block, hist, num_rx, num_time)
        # GSPMD twin must equal the shard_map program here too.
        gs = sharded.make_stream_detector_gspmd(det, total_blocks, m)
        out_gs = {k: np.asarray(v) for k, v in gs(dev).items()}
        for k in out:
            np.testing.assert_allclose(out_gs[k], out[k], atol=2e-4,
                                       err_msg="%s gspmd:%s" % (geom, k))
        for r, cap in enumerate(caps):
            ref = {k: np.asarray(v) for k, v in det(cap.blocks).items()}
            np.testing.assert_array_equal(
                out["detected"][r], ref["detected"], err_msg=geom)
            np.testing.assert_array_equal(
                out["corr_sample"][r], ref["corr_sample"], err_msg=geom)
            np.testing.assert_allclose(
                out["corr_offset"][r], ref["corr_offset"], atol=2e-4,
                err_msg=geom)


def test_stream_detector_with_template_bank():
    """The halo-exchange streaming program supports template banks:
    per-block winning template survives the rx/time sharding."""
    bank = np.stack([template.generate(5, i, 2.0) for i in (0, 1, 2)])
    det = BatchDetector(bank, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110)))
    num_rx, num_time, s_loc = 1, 8, 3
    total = num_time * s_loc
    cap = sim.synth_capture(
        num_blocks=total, bursts_every=3, template=bank[1],
        block_len=BLOCK, history_len=HISTORY, carrier_bin=40.25,
        amplitude=0.8, noise_std=0.05, seed=9, quantize=False)
    stream = cap.blocks[:, HISTORY:].reshape(1, -1)
    m = mesh_mod.make_mesh(num_rx=num_rx, num_time=num_time)
    fn = sharded.make_stream_detector(det, num_rx, s_loc, m)
    out = {k: np.asarray(v) for k, v in fn(
        sharded.shard_stream(stream, m)).items()}
    ref = {k: np.asarray(v) for k, v in det(cap.blocks).items()}
    np.testing.assert_array_equal(out["detected"][0], ref["detected"])
    np.testing.assert_array_equal(
        out["template_idx"][0], ref["template_idx"])
    for burst in cap.bursts:
        assert out["detected"][0][burst.block_idx]
        assert out["template_idx"][0][burst.block_idx] == 1
