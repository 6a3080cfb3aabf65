"""Samplers: witness, challenge space, verifier randomness, JL matrices.

Replaces the reference's thread_rng-based generators (``util.rs:27-104``,
``verification.rs:441-566``, ``proofgen.rs:460-518``) with explicit
jax.random keys — fully jittable, reproducible, and device-resident.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .params import LabradorParams, T_OPNORM
from .ops.modmath import mod_pos, u64_sum, u64_leq_const, sum_sq_u64
from .ops import ntt as ntt_ops
from .ops import zq as zq_ops


def uniform_zq(key: jax.Array, shape, q: int):
    """Uniform [0, q) via 64-bit reduction (bias < q/2^64): int32 for small
    q, two-limb ``zq.Zq2`` for big q.  Counterpart of
    ``generate_polynomial``/``random_sample_zq`` (``util.rs:27-35,158-164``)."""
    bits = jax.random.bits(key, tuple(shape) + (2,), jnp.uint32)
    if zq_ops.is_big(q):
        from .ops.bigq import _u64_mod_q
        rh, rl = _u64_mod_q((bits[..., 0].astype(jnp.int32),
                             bits[..., 1].astype(jnp.int32)), q)
        return zq_ops.from_words32(rh, rl)
    c32 = (1 << 32) % q

    def u32_mod_q(u):
        hi = (u >> 16).astype(jnp.int32)
        lo = (u & jnp.uint32(0xFFFF)).astype(jnp.int32)
        return mod_pos(mod_pos(hi * ((1 << 16) % q), q) + lo, q)

    r0 = u32_mod_q(bits[..., 0])
    r1 = u32_mod_q(bits[..., 1])
    return mod_pos(r0 * c32 % q + r1, q)


# ---------------------------------------------------------------------------
# Witness
# ---------------------------------------------------------------------------

def generate_witness(key: jax.Array, params: LabradorParams) -> jax.Array:
    """(r, n, d) witness with sum of squared (raw-residue) coefficients
    <= beta^2.

    The reference samples uniform coefficients and then repeatedly halves
    *randomly chosen* entries until the norm bound holds
    (``proofgen.rs:460-518``).  Vectorized variant: halve **all** entries
    per rejection round (same invariant, same halving primitive
    ``reduce_polynomial``/``util.rs:37-51`` applied globally; distribution
    of scales differs slightly — witness generation is test-data synthesis,
    not protocol).
    """
    p = params
    w = uniform_zq(key, (p.r, p.n, p.d), p.q)
    if zq_ops.is_big(p.q):
        # pre-shift the two-limb draw into int32 range (beta << 2^30, so
        # every accepted witness is reachable after this deterministic
        # halving prefix), then run the same int32 rejection loop.
        k0 = max(0, p.q.bit_length() - 30)
        if k0 <= 16:
            w = (w.hi << (16 - k0)) + (w.lo >> k0)
        else:
            w = w.hi >> (k0 - 16)
    bound = p.beta_bound * p.beta_bound

    def halve(w):
        return w // 2

    # Phase 1: per-element halving until count * max(w)^2 < 2^63 — a plain
    # int32 max comparison, no u64 sum.  Without it the true sum of squares
    # of pre-rejection values (up to 2^30 each) can exceed 2^64 and wrap
    # sum_sq_u64, spuriously accepting an over-norm witness.
    count = p.r * p.n * p.d
    elem_cap = min(math.isqrt((1 << 63) // count), 2**30)

    def any_huge(w):
        return jnp.max(w) > elem_cap

    w = jax.lax.while_loop(any_huge, halve, w)

    # Phase 2: the exact sum-of-squares rejection loop (now within
    # sum_sq_u64's < 2^64 exactness contract).
    def too_big(w):
        return ~u64_leq_const(sum_sq_u64(w), bound)

    return jax.lax.while_loop(too_big, halve, w)


# ---------------------------------------------------------------------------
# Challenge space (reference verification.rs:460-489, util.rs:83-104,227-246)
# ---------------------------------------------------------------------------

def _challenge_multiset(d: int) -> np.ndarray:
    if d == 64:
        # 23 zeros, 31 ones, 10 twos: ||c||^2 = 31 + 40 = 71 = TAU
        return np.array([0] * 23 + [1] * 31 + [2] * 10, np.int32)
    # degenerate fallback mirroring the reference's else-branch shape
    base = [1, 0] * ((d + 1) // 2)
    return np.array(base[:d], np.int32)


@lru_cache(maxsize=None)
def _eval_matrices(d: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag parts of the (d, d) matrix evaluating a real-coefficient
    polynomial at the primitive 2d-th roots e^{i pi (2k+1)/d}."""
    j = np.arange(d)[:, None]
    k = np.arange(d)[None, :]
    ang = np.pi * (2 * k + 1) * j / d
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def operator_norm_exact(c_centered: jax.Array, d: int) -> jax.Array:
    """Exact operator norm of multiplication by c in Rq ⊗ R: the negacyclic
    multiplication matrix is normal with eigenvalues c(omega^{2k+1}), so the
    spectral norm is max_k |c(omega^{2k+1})|.

    This replaces the reference's 1000-sample statistical sup-estimate
    (``operator_norm``, util.rs:227-246) with the true value; the estimate
    can only under-approximate it, so exact rejection is sound (and far
    cheaper: one 64x64 matmul instead of 1000 ring products).
    """
    er, ei = _eval_matrices(d)
    cf = c_centered.astype(jnp.float32)
    re = cf @ jnp.asarray(er)
    im = cf @ jnp.asarray(ei)
    return jnp.sqrt(jnp.max(re * re + im * im))


def operator_norm_sampled(key: jax.Array, c: jax.Array,
                          params: LabradorParams, n_samples: int = 1000) -> jax.Array:
    """Reference-faithful statistical estimate (util.rs:227-246): sup over
    n_samples random ring elements of ||c*r|| / ||r||, batched on device."""
    plan = ntt_ops.plan_for(params)
    r = uniform_zq(key, (n_samples, params.d), params.q)
    prod = ntt_ops.negacyclic_polymul(jnp.broadcast_to(c, r.shape), r, plan)
    # reference computes norms over raw residues in [0, q)
    num = jnp.sqrt(jnp.sum(prod.astype(jnp.float64 if jax.config.jax_enable_x64
                                       else jnp.float32) ** 2, axis=-1))
    den = jnp.sqrt(jnp.sum(r.astype(num.dtype) ** 2, axis=-1))
    return jnp.max(num / den)


def sample_challenge(key: jax.Array, params: LabradorParams) -> jax.Array:
    """One challenge polynomial c: random signed permutation of the fixed
    multiset, rejected while operator norm > T (= 15).

    Sign rule matches ``generate_polynomial_picky`` (util.rs:83-104): a
    coefficient is negated iff it is > 0 and an independent fair bit is set.
    Stored as residues mod q; rejection uses the exact operator norm.
    """
    p = params
    multiset = jnp.asarray(_challenge_multiset(p.d))

    def draw(key):
        kp, ks = jax.random.split(key)
        perm = jax.random.permutation(kp, multiset)
        signs = jax.random.bernoulli(ks, 0.5, (p.d,))
        centered = jnp.where(signs & (perm > 0), -perm, perm)
        return centered

    def cond(carry):
        _, centered = carry
        return operator_norm_exact(centered, p.d) > T_OPNORM

    def body(carry):
        key, _ = carry
        key = jax.random.fold_in(key, 1)
        return key, draw(key)

    key0 = jax.random.fold_in(key, 0)
    _, centered = jax.lax.while_loop(cond, body, (key0, draw(key0)))
    if zq_ops.is_big(p.q):
        # big-q convention: small-valued tensors stay *signed* int32 (the
        # canonical lift would force every consumer onto the two-limb path
        # for values in {-2..2})
        return centered
    return mod_pos(centered, p.q)


# ---------------------------------------------------------------------------
# Verifier scalar/poly randomness (verification.rs:441-513)
# ---------------------------------------------------------------------------

def sample_psi(key: jax.Array, params: LabradorParams) -> jax.Array:
    """(L,) uniform Zq — ``generate_psi`` (verification.rs:491-501)."""
    return uniform_zq(key, (params.l_count,), params.q)


def sample_omega(key: jax.Array, params: LabradorParams) -> jax.Array:
    """(256,) uniform Zq — ``generate_omega`` (verification.rs:503-513)."""
    return uniform_zq(key, (256,), params.q)


def sample_alpha(key: jax.Array, params: LabradorParams) -> jax.Array:
    """(K, d) uniform ring elements — ``fetch_alpha`` (verification.rs:441-447)."""
    return uniform_zq(key, (params.k_count, params.d), params.q)


def sample_beta(key: jax.Array, params: LabradorParams) -> jax.Array:
    """(upper_bound, d) uniform ring elements — ``fetch_beta``
    (verification.rs:449-456)."""
    return uniform_zq(key, (params.upper_bound, params.d), params.q)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection matrices (verification.rs:553-566)
# ---------------------------------------------------------------------------

def sample_jl_matrix(key: jax.Array, params: LabradorParams) -> jax.Array:
    """(256, n*d) ternary matrix, P(-1)=P(+1)=1/4, P(0)=1/2, as int8."""
    p = params
    bits = jax.random.bits(key, (256, p.n * p.d), jnp.uint32)
    b0 = (bits & 1).astype(jnp.int8)
    b1 = ((bits >> 1) & 1).astype(jnp.int8)
    # 00 -> -1, 01/10 -> 0, 11 -> +1
    return (b0 + b1) - jnp.int8(1)
