"""Persistent-compilation-cache setup shared by tests and CPU benchmarks.

Two environment quirks live here so every entry point gets them right:

* the cache must never be enabled for the axon remote-TPU backend (it
  hangs the relay indefinitely — CLAUDE.md), so callers only invoke this
  after forcing ``jax_platforms=cpu``;
* the zstandard C extension segfaults in-process on the ~150 MB
  serialized executables of the two-level recursion programs (observed on
  both the compress and the decompress path, while the same payloads
  round-trip fine in a standalone process), so the cache is pinned to
  zlib — slower, stable.  Entries written before this switch were zstd-
  compressed and unreadable under zlib; bump the directory name when
  changing compression.
"""

from __future__ import annotations

CACHE_DIR = "/root/.cache/jax_comp"


def enable_persistent_cache(min_compile_secs: float = 1.0) -> None:
    import jax
    from jax._src import compilation_cache as _cc

    _cc.zstd = None
    _cc.zstandard = None
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
