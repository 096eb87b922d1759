"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding/collective
tests exercise the same pjit/shard_map programs on 8 virtual CPU devices
(`--xla_force_host_platform_device_count=8`), mirroring the strategy in
SURVEY.md §4.  Environment variables must be set before jax initializes.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
