"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a fake-device mesh via
``--xla_force_host_platform_device_count=8`` (the standard way to test
pjit/ppermute layouts without a TPU pod — SURVEY.md §4).  Must be set before
JAX initializes, hence the environment mutation at import time.
"""

import os

# Note: the image pins JAX_PLATFORMS=axon in a way plain env overrides don't
# undo; jax.config.update is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
