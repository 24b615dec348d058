"""Test harness: hermetic CPU-only JAX with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), the standard JAX trick for
testing shard_map/pjit layouts without TPU hardware (SURVEY.md §4).

This image preloads jax via an axon sitecustomize with JAX_PLATFORMS=axon
(one real TPU chip), so env vars alone are too late — we switch the
platform at runtime and clear the backend cache before any test touches a
device.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._clear_backends()
except Exception:  # pragma: no cover - private API fallback
    pass

assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU"
