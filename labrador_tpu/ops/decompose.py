"""Base-b gadget decomposition of ring elements.

Vectorized counterpart of ``decompose_polynomial`` / ``decompose_polynomial_vec``
(reference ``util.rs:360-442``).

Two modes:

  * ``reference`` (default) — digit rule replicated bit-for-bit, including
    the quirky ``centered_rep`` at ``util.rs:377-387``: for a digit
    d0 = c mod b with d0 > floor(b/2) the stored digit is the *positive*
    value b - d0, and the next value is the floor of (c - (b - d0)) / b.
    This makes the decomposition lossy (digits do not reconstruct c when any
    d0 > b/2), but the reference protocol is self-consistent about it —
    prover (``proofgen.rs:101-124``) and verifier checks 10-14/19/20 all use
    the same rule, so parity requires it.

  * ``exact`` — true balanced-digit decomposition: signed digits in
    [-ceil(b/2)+1, floor(b/2)] with exact reconstruction c = sum d_k b^k.
    Returned digits are signed int32; lift with ``lift_digits`` before use
    in ring arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .modmath import mod_pos


def decompose(x: jax.Array, base: int, ndigits: int,
              mode: str = "reference") -> jax.Array:
    """Decompose residues in [0, q) into `ndigits` base-`base` digits.

    Returns (ndigits, *x.shape) int32.  mode='reference' digits are in
    [0, floor(b/2)] U (b/2, b) smalls; mode='exact' digits are signed.
    Matches the reference's fixed-length truncation: the scalar loop at
    ``util.rs:405-420`` emits digits until the value is exhausted, and the
    consumer (``util.rs:425-440``) keeps only the first `ndigits` — running
    the update rule a fixed `ndigits` times computes exactly those digits.
    """
    b = int(base)
    half = b // 2
    c = x.astype(jnp.int32)
    digits = []
    for _ in range(int(ndigits)):
        d0 = c % b
        if mode == "reference":
            dig = jnp.where(d0 > half, b - d0, d0)
        elif mode == "exact":
            dig = jnp.where(d0 > half, d0 - b, d0)
            if b % 2 == 0:
                # even base: d0 == b/2 is the redundant digit (+-b/2 both
                # valid).  Pick the sign of the remaining value so the
                # residual shrinks toward 0 — with a fixed +b/2 the base-2
                # residual of a negative value sticks at -1 forever and the
                # truncated reconstruction is off by b^ndigits.
                dig = jnp.where((d0 == half) & (c < 0), d0 - b, dig)
        else:
            raise ValueError(f"unknown decompose mode {mode!r}")
        digits.append(dig)
        c = (c - dig) // b   # floor division; reference semantics for mode
        # 'reference' rely on both operands nonneg (true: c >= dig >= 0 there)
    return jnp.stack(digits, axis=0)


def lift_digits(digits: jax.Array, q: int) -> jax.Array:
    """Signed digits -> canonical residues in [0, q) for ring arithmetic."""
    return mod_pos(digits, q)


def reconstruct(digits: jax.Array, base: int, q: int) -> jax.Array:
    """sum_k digits[k] * base^k  (mod q).  Exact-mode digits reconstruct the
    original residue; reference-mode digits generally do NOT (documented
    quirk) — provided for tests."""
    ndigits = digits.shape[0]
    out = jnp.zeros(digits.shape[1:], jnp.int32)
    weight = 1
    for k in range(ndigits):
        out = mod_pos(out + mod_pos(digits[k] * (weight % q), q), q)
        weight *= base
    return out
