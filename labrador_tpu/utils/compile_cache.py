"""Persistent-compilation-cache setup shared by tests and CPU benchmarks.

Three environment quirks live here so every entry point gets them right:

* the cache must never be enabled for the axon remote-TPU backend (it
  hangs the relay indefinitely — CLAUDE.md), so callers only invoke this
  after forcing ``jax_platforms=cpu``;
* the zstandard C extension segfaults in-process on the ~150 MB
  serialized executables of the two-level recursion programs (observed on
  both the compress and the decompress path, while the same payloads
  round-trip fine in a standalone process), so the cache is pinned to
  zlib — slower, stable.  Entries written before this switch were zstd-
  compressed and unreadable under zlib; bump the directory name when
  changing compression;
* XLA's ``deserialize_executable`` ALSO segfaults in-process on very
  large serialized executables (observed reproducibly mid-suite while
  loading a big cached sharded-prover program — round-3 review).  So the
  cache is **size-gated** here: oversize entries are purged at setup,
  never written, and treated as misses if some other process wrote one.
  Giant programs simply recompile every run; everything else stays warm.
"""

from __future__ import annotations

import os

# overridable so CI can run a genuinely cold suite next to a warm one
CACHE_DIR = os.environ.get("LABRADOR_COMPILE_CACHE",
                           "/root/.cache/jax_comp")

# Compressed on-disk entry cap.  The observed-crashing entries were
# ~150 MB serialized; zlib gets ~3x on XLA executables, so 24 MB
# compressed keeps the decompressed payload comfortably under the crash
# regime while letting every ordinary prover/verifier program (largest
# seen: 3.2 MB) stay cached.
MAX_ENTRY_BYTES = 24 << 20
# Decompressed serialized-executable cap for the read path (belt +
# braces: a ~24 MB zlib entry could still inflate past the crash regime).
MAX_SERIALIZED_BYTES = 80 << 20


def enable_persistent_cache(min_compile_secs: float = 1.0,
                            max_entry_bytes: int = MAX_ENTRY_BYTES,
                            max_serialized_bytes: int = MAX_SERIALIZED_BYTES,
                            ) -> None:
    import jax

    # The size gate below monkeypatches private jax internals whose
    # signatures were verified against jax 0.9.x only; on any other version
    # fall back to NOT caching (with a warning) rather than risk re-exposing
    # the deserialize_executable segfault path (ADVICE r4).
    if not jax.__version__.startswith("0.9."):
        import warnings
        warnings.warn(
            f"labrador_tpu compile-cache size gate is pinned to jax 0.9.x "
            f"internals (found {jax.__version__}); persistent compilation "
            f"cache DISABLED", RuntimeWarning)
        return

    from jax._src import compilation_cache as _cc

    _cc.zstd = None
    _cc.zstandard = None
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)

    # 1. purge stale oversize entries so a warm run can never deserialize
    #    one (they may predate the size gate, or come from another tree).
    try:
        for name in os.listdir(CACHE_DIR):
            path = os.path.join(CACHE_DIR, name)
            try:
                if os.path.isfile(path) and \
                        os.path.getsize(path) > max_entry_bytes:
                    os.unlink(path)
            except OSError:
                pass
    except OSError:
        pass

    # 2./3. size-gate the module-level read/write entry points (idempotent).
    if getattr(_cc, "_labrador_size_gate", None) is not None:
        return
    _cc._labrador_size_gate = (max_entry_bytes, max_serialized_bytes)

    def get_gated(cache_key, compile_options, backend, executable_devices):
        """Mirror of ``compilation_cache.get_executable_and_time`` (jax
        0.9.0) with byte-size gates before decompression/deserialization."""
        cache = _cc._get_cache(backend)
        if cache is None:
            return None, None
        blob = cache.get(cache_key)
        if blob is None or len(blob) > max_entry_bytes:
            return None, None
        executable_and_time = _cc.decompress_executable(blob)
        serialized, compile_time = _cc.extract_executable_and_time(
            executable_and_time)
        if len(serialized) > max_serialized_bytes:
            return None, None
        return backend.deserialize_executable(
            serialized, executable_devices, compile_options), compile_time

    def put_gated(cache_key, module_name, executable, backend, compile_time):
        """Mirror of ``put_executable_and_time`` minus logging; drops
        entries whose compressed blob exceeds the gate.  Also skips the
        write entirely under memory pressure: ``executable.serialize()``
        itself segfaulted once mid-suite at high RSS (round 5,
        bench_logs/suite segv in put_gated) — a cache miss next run is
        strictly better than a crashed suite."""
        cache = _cc._get_cache(backend)
        if cache is None:
            return
        try:
            with open("/proc/self/statm") as f:
                rss_bytes = int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
            if rss_bytes > 5 << 30:
                return
        except (OSError, ValueError, IndexError):
            pass
        serialized = executable.serialize()
        executable_and_time = _cc.combine_executable_and_time(
            serialized, compile_time)
        executable_and_time = _cc.compress_executable(executable_and_time)
        if len(executable_and_time) > max_entry_bytes:
            return
        min_entry = _cc.config.persistent_cache_min_entry_size_bytes.value
        if len(executable_and_time) < min_entry:
            return
        cache.put(cache_key, executable_and_time)

    # jax._src.compiler._cache_read/_cache_write resolve these through the
    # compilation_cache module object at call time, so patching the module
    # attributes covers every jit compile path.
    _cc.get_executable_and_time = get_gated
    _cc.put_executable_and_time = put_gated
