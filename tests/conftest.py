"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding/collective
tests exercise the same pjit/shard_map programs on 8 virtual CPU devices,
mirroring the strategy in SURVEY.md §4.

Note: this image's sitecustomize registers the axon TPU plugin and
force-sets ``jax_platforms="axon,cpu"`` from inside ``register()``, so the
``JAX_PLATFORMS`` env var alone is NOT enough — the config must be
re-overridden after importing jax (before any backend initializes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
