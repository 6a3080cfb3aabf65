"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise a real (emulated) mesh without TPU hardware, per SURVEY.md §4.

The container's sitecustomize pre-imports jax and registers a TPU-tunnel
backend, so plain env vars are too late; ``jax.config.update`` still wins
as long as no backend has been initialized yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles ~15 large programs
# (prover/verifier variants); caching them across runs cuts minutes off
# every invocation.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
