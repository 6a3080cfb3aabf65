"""Host-side exact golden implementations (numpy object dtype, arbitrary q).

These mirror the reference's *schoolbook* path (``Rq::multiply`` with
NTT_ENABLED=false → ``algebraic.rs:402-403`` + degree reduction at
``algebraic.rs:352-376``) and serve as the correctness oracle for the TPU
NTT kernels, replacing the reference's ``test_NTT_preserves_result``
property (``tests/proptest.rs:13-24``).
"""

from __future__ import annotations

import numpy as np


def negacyclic_mul(a, b, q: int) -> np.ndarray:
    """Exact schoolbook negacyclic product of two (d,) integer vectors mod q."""
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    d = a.shape[-1]
    out = np.zeros(d, dtype=object)
    for i in range(d):
        for j in range(d):
            k = i + j
            if k < d:
                out[k] += a[i] * b[j]
            else:
                out[k - d] -= a[i] * b[j]
    return np.array([int(x) % q for x in out], dtype=object)


def polyvec_inner(a, b, q: int) -> np.ndarray:
    """Exact <a, b> for (m, d) vectors of ring elements mod q."""
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    d = a.shape[-1]
    acc = np.zeros(d, dtype=object)
    for i in range(a.shape[0]):
        acc = acc + negacyclic_mul(a[i], b[i], q)
    return np.array([int(x) % q for x in acc], dtype=object)


def sigma_inv(a, q: int) -> np.ndarray:
    """Golden conjugation automorphism (``util.rs:118-137``)."""
    a = np.asarray(a, dtype=object)
    d = a.shape[-1]
    out = np.zeros(d, dtype=object)
    out[0] = int(a[0]) % q
    for n in range(1, d):
        out[d - n] = (-int(a[n])) % q
    return out


def decompose_coeff_reference(val: int, base: int, ndigits: int) -> list[int]:
    """Scalar transliteration of the reference digit loop
    (``util.rs:405-420``) for cross-checking the vectorized kernel."""
    digits = []
    c = int(val)
    while c != 0:
        d0 = c % base
        r = (base - d0) % base if d0 > base // 2 else d0
        digits.append(r)
        c = (c - r) // base
    digits = digits[:ndigits]
    digits += [0] * (ndigits - len(digits))
    return digits
