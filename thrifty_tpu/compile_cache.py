"""Persistent XLA compile cache -- the FFTW-wisdom analog.

The reference amortizes FFTW planning cost across runs with wisdom
files (fastcard/fastcard.c:32-37,139-144; rpi/fastdet.cfg:12).  The
TPU-era equivalent is JAX's persistent compilation cache: compiled
executables for the batched detect program are stored on disk, so a
cold `thrifty-tpu detect`/`serve` start skips XLA compilation entirely
when the program was compiled before.

Enabled by every CLI entry point (thrifty_tpu.cli) and by bench.py.
The location is ``$THRIFTY_TPU_JAX_CACHE`` when set, else a caller
default, else ``~/.cache/thrifty_tpu/jax_cache``.
"""

from __future__ import annotations

import os


def enable_compile_cache(default_dir=None):
    """Point JAX's persistent compilation cache at a stable directory.

    Returns the cache directory, or None when JAX is unavailable /
    misconfigured (the cache is an optimization, never a requirement).
    """
    try:
        import jax

        cache_dir = (
            os.environ.get("THRIFTY_TPU_JAX_CACHE")
            or default_dir
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "thrifty_tpu", "jax_cache")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program, however small/fast to compile: the CLIs
        # compile a handful of programs and cold-start latency is what
        # we are amortizing (compiles via a remote relay can take
        # minutes on degraded links).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        return cache_dir
    except Exception:  # noqa: BLE001 -- cache is an optimization only
        return None
