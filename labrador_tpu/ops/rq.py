"""Batched ring operations on Rq = Zq[X]/(X^d + 1).

Ring elements are int32 coefficient tensors of shape (..., d) with canonical
residues in [0, q).  These are the vectorized counterparts of the scalar
``Rq``/``Zq`` methods and ``util.rs`` free functions in the reference
(``/root/reference/src/algebraic.rs:304-545``, ``src/util.rs``); each op notes
its origin.  Multiplication lives in ``ops.ntt``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .modmath import mod_pos, u64_sum, u64_to_py


def add(a: jax.Array, b: jax.Array, q: int) -> jax.Array:
    """Rq addition (``algebraic.rs:441-459``)."""
    return mod_pos(a + b, q)


def sub(a: jax.Array, b: jax.Array, q: int) -> jax.Array:
    """Rq subtraction (``algebraic.rs:461-469``)."""
    return mod_pos(a - b, q)


def neg(a: jax.Array, q: int) -> jax.Array:
    """Negation; 0 stays 0 (``algebraic.rs:56-63``)."""
    return mod_pos(-a, q)


def scale(a: jax.Array, s, q: int) -> jax.Array:
    """Scale by Zq element(s); broadcasts.  ``scale_polynomial``
    (``util.rs:176-180``).  Requires q <= 2^15 so s*a fits int32."""
    return mod_pos(a * s, q)


def eval_at_zero(a: jax.Array) -> jax.Array:
    """Constant coefficient = p(0) (``Rq::eval`` with x=0, used for b' at
    ``structs.rs:373`` and the b'' check at ``verification.rs:550``)."""
    return a[..., 0]


def sigma_inv(a: jax.Array, q: int | None) -> jax.Array:
    """Conjugation automorphism sigma^{-1}: X^n -> -X^{d-n} (constant term
    fixed).  Reference ``util.rs:118-137``.

    Implemented as reverse + roll + negate: for n >= 1 the coefficient at
    degree n moves (negated) to degree d-n.  q=None keeps values signed
    (the big-q convention for small-valued tensors)."""
    d = a.shape[-1]
    rev = jnp.flip(a, axis=-1)            # rev[j] = a[d-1-j]
    rolled = jnp.roll(rev, 1, axis=-1)    # rolled[j] = a[d-j]  (j>=1), rolled[0]=a[d-1-... ]
    # rolled[0] = rev[d-1] = a[0]: constant term lands correctly.
    negated = -rolled if q is None else mod_pos(-rolled, q)
    # constant coefficient keeps its sign:
    return negated.at[..., 0].set(a[..., 0])


def norm_sq_exact(a: jax.Array) -> int:
    """Host-side exact squared L2 norm of the raw residues (NOT centered),
    matching ``poly_norm`` (``util.rs:195-202``) which squares the values in
    [0, q).  Uses emulated u64 accumulation — exact where the reference's
    f64 Check 14 loses precision (``README.md:10``)."""
    return u64_to_py(u64_sum(a * a))


def norm_sq_u64(a: jax.Array):
    """On-device exact squared norm as an emulated u64 pair (hi, lo)."""
    return u64_sum(a * a)


def norm_sq_f64_like(a) -> float:
    """Reference-faithful accumulation: per-poly i128 sum cast to f64, then
    f64 summation (``util.rs:188-202``, ``verification.rs:231-255``).  Kept
    for bit-exact parity with the reference's buggy Check 14."""
    import numpy as np
    arr = np.asarray(a, dtype=np.int64)
    per_poly = (arr.astype(object) ** 2).reshape(-1, arr.shape[-1]).sum(axis=1)
    total = 0.0
    for v in per_poly:
        total += float(v)
    return total


def constant_poly(value, d: int, q: int) -> jax.Array:
    out = jnp.zeros((d,), jnp.int32)
    return out.at[0].set(jnp.asarray(value, jnp.int32) % q)


def coeff_concat(vec: jax.Array) -> jax.Array:
    """(..., m, d) -> (..., m*d): concatenate coefficients of a vector of
    ring elements (``witness_coeff_concat``, ``util.rs:446-467``)."""
    return vec.reshape(*vec.shape[:-2], vec.shape[-2] * vec.shape[-1])


def coeff_split(flat: jax.Array, d: int) -> jax.Array:
    """Inverse of coeff_concat (``concat_coeff_reduction``, ``util.rs:472-482``)."""
    m = flat.shape[-1] // d
    return flat.reshape(*flat.shape[:-1], m, d)
