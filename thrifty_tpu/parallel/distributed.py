"""Multi-host runtime initialisation and pod-level mesh construction.

A pod slice runs one process per host; `jax.distributed` stitches them
into one logical device set, and the (rx, time) mesh spans every chip.
Receivers map to hosts (their IQ streams arrive over DCN at the host
that feeds them), so the frequent collective -- the 4920-sample history
halo between time-neighbouring shards -- rides ICI within a host's
chips, while the rx axis crosses hosts only for the final detection
all-gather.

This module cannot be exercised on single-host CI; its logic is the
thin glue below, and the sharded programs it feeds are validated on
virtual multi-device meshes (tests/test_sharded.py,
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import jax

from thrifty_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kwargs):
    """Initialise the multi-host runtime (idempotent wrapper).

    With no arguments, relies on the cluster environment (TPU pod
    metadata) exactly like ``jax.distributed.initialize()``.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        # Only repeat-initialization is ok.  jax has phrased that error
        # both as "...is already initialized" and as "...should only be
        # called once." across versions; match both.
        msg = str(e)
        if "already" not in msg and "only be called once" not in msg:
            raise  # genuinely failed


def pod_mesh(num_rx=None):
    """Build the (rx, time) mesh over every chip in the pod slice.

    By default one rx shard per host (receivers feed hosts), with each
    host's chips forming the time axis.
    """
    if num_rx is None:
        num_rx = jax.process_count()
    return make_mesh(num_rx=num_rx, devices=jax.devices())


def is_coordinator() -> bool:
    """True on the process that should write merged outputs."""
    return jax.process_index() == 0
