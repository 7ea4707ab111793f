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
# Persistent compile cache: the suite is compile-dominated on 1 CPU (most
# equivalence tests spend 10-30 s in XLA), so re-runs in the same checkout
# skip straight to execution.  Safe: entries are keyed on the HLO hash.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
