"""2^32-scale modulus (constants.rs:196 commented config): exact ring
arithmetic via two-limb lanes + u64-emulated Barrett — correct where the
reference's 2^64 two's-complement wraparound (algebraic.rs:417-419)
silently corrupts."""

import numpy as np
import pytest

from labrador_tpu.params import find_suitable_prime
from labrador_tpu.ops import bigq
from labrador_tpu.utils import golden

Q_BIG = find_suitable_prime((1 << 32) - 1)  # 4294967311


def test_q_big_value():
    assert Q_BIG == 4294967311


def test_bigq_polymul_matches_golden():
    rng = np.random.default_rng(1)
    for _ in range(3):
        a = rng.integers(0, Q_BIG, size=(64,), dtype=np.uint64).astype(object)
        b = rng.integers(0, Q_BIG, size=(64,), dtype=np.uint64).astype(object)
        got = bigq.negacyclic_polymul_big(a, b, Q_BIG)
        want = golden.negacyclic_mul(a, b, Q_BIG)
        assert all(int(x) == int(y) for x, y in zip(got, want))


def test_bigq_wraparound_regime():
    """Max-magnitude inputs: convolution coefficients ~ 2^70, far beyond the
    reference's 2^64 wraparound — the case it cannot compute."""
    a = np.full(64, Q_BIG - 1, dtype=object)
    b = np.full(64, Q_BIG - 1, dtype=object)
    got = bigq.negacyclic_polymul_big(a, b, Q_BIG)
    want = golden.negacyclic_mul(a, b, Q_BIG)
    assert all(int(x) == int(y) for x, y in zip(got, want))


def test_bigq_batched():
    rng = np.random.default_rng(2)
    a = rng.integers(0, Q_BIG, size=(5, 64), dtype=np.uint64).astype(object)
    b = rng.integers(0, Q_BIG, size=(5, 64), dtype=np.uint64).astype(object)
    got = bigq.negacyclic_polymul_big(a, b, Q_BIG)
    for i in range(5):
        want = golden.negacyclic_mul(a[i], b[i], Q_BIG)
        assert all(int(x) == int(y) for x, y in zip(got[i], want))


def test_limb_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.integers(0, Q_BIG, size=(100,), dtype=np.uint64).astype(object)
    hi, lo = bigq.split_limbs(x)
    back = bigq.join_limbs(hi, lo)
    assert all(int(a) == int(b) for a, b in zip(back, x))
