"""Force tests onto a virtual 8-device CPU mesh (no TPU required).

The driver benches on real TPU; unit tests exercise the same code paths
on CPU with 8 virtual devices so sharding tests run anywhere.  The
environment may pre-register an accelerator platform (JAX_PLATFORMS is
prepended to by site customization), so the platform is forced via
jax.config after import, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Allow float64 in tests: oracle comparisons need f64 inputs to stay f64.
# Device-path tests still exercise f32 (their inputs are complex64/float32).
jax.config.update("jax_enable_x64", True)
