"""Two-process jax.distributed run of the sharded streaming detector.

Spawns two coordinator-connected processes, each owning 4 virtual CPU
devices, forming a global (rx=2, time=4) mesh; each process feeds its
process-local shard of the streams and the gathered detection table is
compared against a single-process reference run.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port,
    num_processes=2, process_id=pid)
assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

from jax.sharding import NamedSharding, PartitionSpec as P
from thrifty_tpu.dsp import template as template_mod
from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
from thrifty_tpu.parallel import mesh as mesh_mod
from thrifty_tpu.parallel import sharded

BLOCK, HISTORY = 1024, 160
NEW = BLOCK - HISTORY
TPL = template_mod.generate(5, 0, 2.0)
NUM_RX, NUM_TIME, PER_SHARD = 2, 4, 2
TOTAL = NUM_TIME * PER_SHARD

det = BatchDetector(TPL, DetectorConfig(
    block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110)))
m = mesh_mod.make_mesh(num_rx=NUM_RX, num_time=NUM_TIME)

# Deterministic global streams; every process builds the same array and
# contributes its local shard.
rng = np.random.default_rng(7)
streams = (rng.normal(size=(NUM_RX, TOTAL * NEW))
           + 1j * rng.normal(size=(NUM_RX, TOTAL * NEW))
           ).astype(np.complex64) * 0.05
n = np.arange(len(TPL))
burst = ((TPL > 0) * np.exp(2j * np.pi * 40 * n / BLOCK)).astype(
    np.complex64)
for r in range(NUM_RX):
    pos = (3 + r) * NEW - HISTORY + 300  # a burst per receiver
    streams[r, pos:pos + len(TPL)] += 0.8 * burst

sharding = NamedSharding(m, P("rx", "time"))
# Every process holds the same global array; hand each device its slice.
global_stream = jax.make_array_from_callback(
    streams.shape, sharding, lambda idx: streams[idx])

fn = sharded.make_stream_detector(det, NUM_RX, PER_SHARD, m, gather=True)
out = fn(global_stream)
detected = np.asarray(out["detected"])
samples = np.asarray(out["corr_sample"])
if pid == 0:
    np.savez(os.path.join(outdir, "multi.npz"),
             detected=detected, samples=samples)
print("OK process", pid)
"""


@pytest.mark.skipif(
    os.environ.get("THRIFTY_TPU_SKIP_MULTIHOST") == "1",
    reason="multi-host test disabled")
def test_two_process_distributed(tmp_path):
    port = "37733"
    procs = []
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER, port, str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, (o, e)

    data = np.load(str(tmp_path / "multi.npz"))
    detected = data["detected"]
    assert detected.shape == (2, 8)

    # Single-process reference on the same deterministic streams.
    import jax
    from thrifty_tpu.dsp import template as template_mod
    from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
    from thrifty_tpu import sim

    BLOCK, HISTORY = 1024, 160
    NEW = BLOCK - HISTORY
    TPL = template_mod.generate(5, 0, 2.0)
    rng = np.random.default_rng(7)
    streams = (rng.normal(size=(2, 8 * NEW))
               + 1j * rng.normal(size=(2, 8 * NEW))
               ).astype(np.complex64) * 0.05
    n = np.arange(len(TPL))
    burst = ((TPL > 0) * np.exp(2j * np.pi * 40 * n / BLOCK)).astype(
        np.complex64)
    for r in range(2):
        pos = (3 + r) * NEW - HISTORY + 300
        streams[r, pos:pos + len(TPL)] += 0.8 * burst

    det = BatchDetector(TPL, DetectorConfig(
        block_len=BLOCK, history_len=HISTORY, carrier_window=(7, 110)))
    for r in range(2):
        blocks = sim.stream_to_blocks(
            streams[r].astype(np.complex128), BLOCK, HISTORY)
        ref = {k: np.asarray(v)
               for k, v in det(blocks.astype(np.complex64)).items()}
        np.testing.assert_array_equal(detected[r], ref["detected"])
        np.testing.assert_array_equal(
            data["samples"][r], ref["corr_sample"])
        assert ref["detected"][3 + r]  # the planted burst


import jax


class TestInitializeIdempotent:
    """The wrapper must swallow BOTH phrasings jax has used for the
    repeat-initialization error; 'should only be called once.' (jax
    0.9) previously escaped and crashed the second caller."""

    @pytest.mark.parametrize("msg", [
        "jax.distributed is already initialized",
        "distributed.initialize should only be called once.",
    ])
    def test_repeat_init_swallowed(self, monkeypatch, msg):
        from thrifty_tpu.parallel import distributed

        def boom(**kw):
            raise RuntimeError(msg)

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        distributed.initialize()  # must not raise

    def test_genuine_failure_raises(self, monkeypatch):
        from thrifty_tpu.parallel import distributed

        def boom(**kw):
            raise RuntimeError("coordinator unreachable")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="unreachable"):
            distributed.initialize()
