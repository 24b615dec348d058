"""Test harness: hermetic CPU-only JAX with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), the standard JAX trick for
testing shard_map/pjit layouts without TPU hardware (SURVEY.md §4).
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
