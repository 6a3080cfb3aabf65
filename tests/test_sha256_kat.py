"""Known-answer tests for the hand-rolled jnp SHA-256 (ops/sha256.py).

Every Fiat-Shamir security claim (FS_SPEC.md §5) rests on this
implementation BEING SHA-256 — a padding or message-schedule bug would be
self-consistent and invisible to the rest of the suite (round-4 verdict
weak #3).  These tests pin it against hashlib and the FIPS 180-4 example
vectors for every word-aligned message class:

  * the two official FIPS 180-4 vectors that are word-aligned (the empty
    message and the 56-byte two-block "abcdbcde..." message — the latter
    sits exactly on the padding boundary where the length words no longer
    fit the final block);
  * hashlib cross-checks at word counts crossing the 55/56/64-byte
    padding boundaries (13/14/15/16/17 words) and multi-block lengths.

``sha256_words`` hashes uint32 words with big-endian byte semantics and a
bit length of 32*n, so a word-aligned byte message maps 1:1.
"""

import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from labrador_tpu.ops.sha256 import sha256_words, hash_arrays


def _words_from_bytes(b: bytes) -> np.ndarray:
    assert len(b) % 4 == 0
    return np.frombuffer(b, dtype=">u4").astype(np.uint32)


def _digest_words(b: bytes) -> np.ndarray:
    return np.frombuffer(hashlib.sha256(b).digest(), dtype=">u4").astype(
        np.uint32)


def _ours(words) -> np.ndarray:
    return np.asarray(sha256_words(jnp.asarray(words, jnp.uint32)))


def test_fips_empty_message():
    """FIPS 180-4 / NIST: SHA-256("") — also the 0-word padding case."""
    want = np.array([0xe3b0c442, 0x98fc1c14, 0x9afbf4c8, 0x996fb924,
                     0x27ae41e4, 0x649b934c, 0xa495991b, 0x7852b855],
                    np.uint32)
    got = _ours(np.zeros((0,), np.uint32))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, _digest_words(b""))


def test_fips_two_block_message():
    """FIPS 180-4 example B.2: the 448-bit (56-byte) message whose padding
    overflows into a second block — the boundary case."""
    msg = b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq"
    assert len(msg) == 56
    want = np.array([0x248d6a61, 0xd20638b8, 0xe5c02693, 0x0c3e6039,
                     0xa33ce459, 0x64ff2167, 0xf6ecedd4, 0x19db06c1],
                    np.uint32)
    got = _ours(_words_from_bytes(msg))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, _digest_words(msg))


@pytest.mark.parametrize("n_words", [1, 2, 13, 14, 15, 16, 17, 31, 32, 33,
                                     100, 1000])
def test_hashlib_cross_check(n_words):
    """hashlib agreement at word counts crossing every padding boundary:
    13 words = 52 B (padding fits), 14 = 56 B (length words overflow to a
    second block), 16 = 64 B (exactly one block -> two), and multi-block."""
    rng = np.random.default_rng(n_words)
    words = rng.integers(0, 1 << 32, size=n_words, dtype=np.uint64).astype(
        np.uint32)
    msg = words.astype(">u4").tobytes()
    np.testing.assert_array_equal(_ours(words), _digest_words(msg),
                                  err_msg=f"n_words={n_words}")


def test_hash_arrays_matches_hashlib():
    """The FS absorb path (domain word + flattened arrays) is the same
    big-endian word stream."""
    a = np.arange(7, dtype=np.int32)
    b = np.array([[3, 1], [4, 1]], np.int32)
    got = np.asarray(hash_arrays(jnp.asarray(a), jnp.asarray(b), domain=9))
    stream = np.concatenate([[9], a.reshape(-1), b.reshape(-1)]).astype(
        np.uint32)
    np.testing.assert_array_equal(got, _digest_words(
        stream.astype(">u4").tobytes()))
