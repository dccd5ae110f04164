"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware.

Note: the environment boots an `axon` TPU PJRT plugin via sitecustomize and
sets jax_platforms programmatically, so the env var alone is not enough —
we must override the config after jax import (backends are not initialized
until first use, so this is safe)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
