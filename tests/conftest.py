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
# every invocation.  zlib-pinned — see utils/compile_cache docstring.
from labrador_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import pytest  # noqa: E402


@pytest.fixture
def no_compile_cache():
    """Opt-out of the persistent cache for tests that compile giant
    programs: XLA's ``executable.serialize()`` / ``deserialize_executable``
    segfault (reproducibly, mid-suite) on the ~150 MB serialized
    executables of the two-level recursion prove/verify programs.  The
    in-memory jit cache is unaffected.

    NOTE ``jax.config.update("jax_enable_compilation_cache", False)`` is
    NOT enough: ``compilation_cache.is_cache_used`` latches its verdict on
    first use, so flipping the flag mid-session is a no-op.  Stubbing the
    put/get entry points is the only reliable per-test switch (and it
    keeps the first-500-ms cache check out of the timing)."""
    from jax._src import compiler as _compiler

    orig_read, orig_write = _compiler._cache_read, _compiler._cache_write
    _compiler._cache_read = lambda *a, **k: (None, None)
    _compiler._cache_write = lambda *a, **k: None
    yield
    _compiler._cache_read, _compiler._cache_write = orig_read, orig_write
