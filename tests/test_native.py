"""Native C++ ChaCha20-compat generator: RFC vectors + layout semantics."""

import numpy as np
import pytest

from labrador_tpu.native import chacha20_keystream, crs_coeffs


def test_chacha20_rfc_vector():
    # draft-agl-tls-chacha20poly1305 TC1: zero key/nonce, counter 0
    ks = chacha20_keystream(b"\x00" * 32, 0)
    assert ks.astype("<u4").tobytes()[:16].hex() == \
        "76b8e0ada0f13d90405d6ae55386bd28"


def test_chacha20_rfc_vector_counter1():
    ks = chacha20_keystream(b"\x00" * 32, 1)
    # TC strongly distinct from counter 0
    ks0 = chacha20_keystream(b"\x00" * 32, 0)
    assert (ks != ks0).any()


def test_crs_coeffs_deterministic_and_in_range():
    v1 = crs_coeffs(b"\x07" * 32, 12345, 64, 8191)
    v2 = crs_coeffs(b"\x07" * 32, 12345, 64, 8191)
    np.testing.assert_array_equal(v1, v2)
    assert (v1 >= 0).all() and (v1 < 8191).all()


def test_crs_coeffs_offset_shift():
    """Coefficient at offset o+1 equals the first coefficient of a fetch
    starting at o+1 — the per-coefficient re-key layout of structs.rs:147-171."""
    a = crs_coeffs(b"\x03" * 32, 100, 8, 8191)
    b = crs_coeffs(b"\x03" * 32, 101, 8, 8191)
    np.testing.assert_array_equal(a[1:], b[:-1])


def test_seed_carry_propagation():
    """base + offset with byte carries must match directly-summed seeds."""
    base = bytes([0] * 31 + [0xFF])
    a = crs_coeffs(base, 1, 1, 8191)          # seed ...0x00 0x01 0x00
    base2 = bytes([0] * 30 + [0x01, 0x00])
    b = crs_coeffs(base2, 0, 1, 8191)
    np.testing.assert_array_equal(a, b)
