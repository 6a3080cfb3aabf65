"""Native (C++) components, loaded via ctypes.

``chacha_compat`` — the reference-bit-exact CRS coefficient generator (see
chacha_compat.cpp).  Built lazily with g++ on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libchacha_compat.so")
_lib = None


def _build() -> None:
    src = os.path.join(_DIR, "chacha_compat.cpp")
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
        check=True, capture_output=True)


def load():
    global _lib
    if _lib is None:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_DIR, "chacha_compat.cpp"))):
            _build()
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.crs_coeffs.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64)]
        _lib.chacha20_keystream.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32)]
    return _lib


def crs_coeffs(base_seed: bytes, offset: int, count: int, q: int) -> np.ndarray:
    """Reference-compatible CRS coefficients: coefficient i is drawn from a
    fresh ChaCha20Rng seeded with base_seed + offset + i (big-endian),
    exactly like ``CRS::generate_random_coeff`` (structs.rs:167-171)."""
    assert len(base_seed) == 32
    lib = load()
    out = np.zeros(count, np.int64)
    lib.crs_coeffs(base_seed, offset, count, q,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def chacha20_keystream(key: bytes, counter: int = 0) -> np.ndarray:
    """One raw ChaCha20 block (16 uint32 words) for test-vector validation."""
    lib = load()
    out = np.zeros(16, np.uint32)
    lib.chacha20_keystream(key, counter,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out
