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
