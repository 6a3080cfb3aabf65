"""Negacyclic NTT over Rq = Zq[X]/(X^d + 1) as batched MXU matmuls.

Role: the TPU-native replacement for concrete-ntt's ``native64::Plan32``
(reference ``constants.rs:197``, used by ``Rq::multiply`` at
``algebraic.rs:379-404``).  Strategy:

  * The default modulus q (8191) is **not** NTT-friendly, so — like the
    reference — we compute the exact *integer* negacyclic convolution of the
    residue representatives and reduce mod q at the end.
  * Exactness comes from a CRT over small internal primes p ≡ 1 (mod 2d),
    p < 2^15 (int32-safe).  Unlike the reference's silent two's-complement
    wraparound at 2^64 (``algebraic.rs:417-419``), the prime set is sized so
    reconstruction is exact for any accumulation the protocol performs.
  * For d = 64 the transform itself is a (batch, 64) @ (64, 64) matmul per
    prime — O(d^2) multiplies instead of O(d log d), but they run on the MXU
    with perfect lane shapes and zero shuffles, which is the fast shape on
    TPU.  Transforms and all linear algebra happen in the evaluation domain;
    inverse transform + Garner mixed-radix reconstruction happen once per
    protocol phase.

Layout convention: evaluation-domain tensors carry a leading prime axis
``(P, ..., d)``; coefficient-domain tensors are ``(..., d)`` int32 in [0, q).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..params import LabradorParams, select_crt_primes
from .modmath import mod_pos, modmul_mm, modmul_mm_p, modmul_point
from . import zq as zq_ops


def _primitive_root(p: int) -> int:
    factors = []
    n = p - 1
    f = 2
    while f * f <= n:
        if n % f == 0:
            factors.append(f)
            while n % f == 0:
                n //= f
        f += 1
    if n > 1:
        factors.append(n)
    for g in range(2, p):
        if all(pow(g, (p - 1) // f, p) != 1 for f in factors):
            return g
    raise ValueError(f"no primitive root for {p}")


@dataclass(frozen=True, eq=False)  # eq=False: identity hash (plans are
class NttPlan:                      # lru_cached singletons; ndarray fields)
    """Precomputed transform + CRT data for a (q, d, primes) triple."""

    q: int
    d: int
    primes: tuple[int, ...]
    V: np.ndarray      # (P, d, d) forward:  xhat = x @ V[p]  (evals at phi^(2k+1))
    W: np.ndarray      # (P, d, d) inverse:  x   = xhat @ W[p]
    garner_inv: np.ndarray   # (P, P) inv(p_j) mod p_k for j < k, else 0
    m_half_digits: tuple[int, ...]  # mixed-radix digits of floor(M/2)
    prefix_mod_q: tuple[int, ...]   # (prod_{i<j} p_i) mod q
    m_mod_q: int

    @property
    def n_primes(self) -> int:
        return len(self.primes)

    @property
    def big(self) -> bool:
        """True when q needs the two-limb (Zq2) coefficient representation."""
        from .modmath import P_MAX
        return self.q > P_MAX


@lru_cache(maxsize=None)
def make_plan(q: int, d: int = 64, max_accum: int = 1 << 20) -> NttPlan:
    """Works for both regimes: q <= P_MAX (single-limb int32 coefficients)
    and big q up to ~2^33 (two-limb Zq2 coefficients, more CRT primes).
    The eval domain is identical in both — per-prime int32 lanes."""
    from .modmath import P_MAX
    if q > zq_ops.Q_BIG_MAX:
        raise NotImplementedError(f"q={q} exceeds the two-limb range (2^33)")
    if P_MAX < q <= (1 << 32):
        # The big-q Barrett layout (ops/bigq._u64_mod_q) requires
        # floor(2^64/q) < 2^32, i.e. q > 2^32; the single-limb path requires
        # q <= P_MAX.  Reject the gap here with a clear error instead of an
        # opaque trace-time assert deep inside prg/sampling.
        raise NotImplementedError(
            f"q={q} unsupported: single-limb arithmetic needs q <= {P_MAX}, "
            f"the two-limb Barrett path needs q > 2^32. Pick q <= {P_MAX} or "
            f"2^32 < q < 2^33 (e.g. q_start=(1 << 32) - 1).")
    primes = select_crt_primes(q, d, max_accum)
    P = len(primes)
    V = np.zeros((P, d, d), np.int32)
    W = np.zeros((P, d, d), np.int32)
    for pi, p in enumerate(primes):
        g = _primitive_root(p)
        phi = pow(g, (p - 1) // (2 * d), p)
        assert pow(phi, d, p) == p - 1, "phi must be a 2d-th root with phi^d=-1"
        d_inv = pow(d, p - 2, p)
        for j in range(d):
            for k in range(d):
                V[pi, j, k] = pow(phi, ((2 * k + 1) * j) % (2 * d), p)
                W[pi, k, j] = d_inv * pow(phi, (-(2 * k + 1) * j) % (2 * d), p) % p
    ginv = np.zeros((P, P), np.int64)
    for k in range(P):
        for j in range(k):
            ginv[j, k] = pow(primes[j], primes[k] - 2, primes[k])
    M = 1
    for p in primes:
        M *= p
    mh = M // 2
    mh_digits = []
    for p in primes:
        mh_digits.append(mh % p)
        mh //= p
    prefix = []
    acc = 1
    for p in primes:
        prefix.append(acc % q)
        acc *= p
    return NttPlan(q=q, d=d, primes=primes, V=V, W=W,
                   garner_inv=ginv, m_half_digits=tuple(mh_digits),
                   prefix_mod_q=tuple(prefix), m_mod_q=M % q)


@lru_cache(maxsize=None)
def plan_for(params: LabradorParams) -> NttPlan:
    # CRT headroom must cover every eval-domain contraction length: the
    # kappa-sized commitment matmuls AND the k_count-sized family
    # contractions (b_final sums K = k_count terms; recursion instances
    # carry k' = kappa + kappa_1 + kappa_2 + 3 families).
    return make_plan(params.q, params.d,
                     max_accum=max(2 * params.kappa, 2 * params.k_count,
                                   1024))


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def ntt_fwd(x, plan: NttPlan) -> jax.Array:
    """Coefficient domain (..., d)  ->  eval domain (P, ..., d).

    Accepts int32 arrays (canonical residues for small q, OR signed small
    values at any q — digits, challenges, ternary rows) and two-limb
    ``zq.Zq2`` tensors (canonical residues at big q).  One exact modular
    matmul against the twiddle matrix per prime (MXU).
    """
    shape = x.shape
    x2 = zq_ops.reshape(x, (-1, plan.d))
    res = zq_ops.to_res(x2, plan.primes)            # (P, B, d)
    out = modmul_mm_p(res, jnp.asarray(plan.V), np.asarray(plan.primes))
    return out.reshape((plan.n_primes,) + shape)


def ntt_inv_modq(xhat: jax.Array, plan: NttPlan):
    """Eval domain (P, ..., d) -> coefficient domain (..., d) in [0, q):
    int32 for small q, ``zq.Zq2`` two-limb for big q.

    Per-prime inverse transform, then Garner mixed-radix reconstruction of
    the signed integer coefficient, reduced mod q.  Exact for any integer
    |X| < M/2 where M = prod(primes).
    """
    shape = xhat.shape[1:]
    r = modmul_mm_p(xhat.reshape(plan.n_primes, -1, plan.d),
                    jnp.asarray(plan.W), np.asarray(plan.primes))
    return zq_ops.fold_res_modq(r.reshape((plan.n_primes,) + shape), plan,
                                signed=True)


def ntt_inv_modp(xhat: jax.Array, plan: NttPlan) -> jax.Array:
    """Eval -> per-prime coefficient residues (P, ..., d), no reconstruction.
    Useful when staying in CRT form across phases."""
    r = modmul_mm_p(xhat.reshape(plan.n_primes, -1, plan.d),
                    jnp.asarray(plan.W), np.asarray(plan.primes))
    return r.reshape(xhat.shape)


# ---------------------------------------------------------------------------
# Convenience ring ops built on the transforms
# ---------------------------------------------------------------------------

def eval_mul(ahat: jax.Array, bhat: jax.Array, plan: NttPlan) -> jax.Array:
    """Pointwise product in the evaluation domain (per prime, one
    vectorized reduction over the whole CRT stack).  Operands broadcast
    like the per-prime slices did: trailing dims align AFTER the leading
    prime axis."""
    nd = max(ahat.ndim, bhat.ndim)
    a = ahat.reshape(ahat.shape[:1] + (1,) * (nd - ahat.ndim)
                     + ahat.shape[1:])
    b = bhat.reshape(bhat.shape[:1] + (1,) * (nd - bhat.ndim)
                     + bhat.shape[1:])
    return mod_pos(a * b, np.asarray(plan.primes))


def negacyclic_polymul(a: jax.Array, b: jax.Array, plan: NttPlan) -> jax.Array:
    """Exact (a * b) in Rq for coefficient tensors (..., d); broadcasts."""
    ahat = ntt_fwd(a, plan)
    bhat = ntt_fwd(b, plan)
    return ntt_inv_modq(eval_mul(ahat, bhat, plan), plan)


def eval_matmul(ahat: jax.Array, bhat: jax.Array, plan: NttPlan) -> jax.Array:
    """Ring-matrix product in the evaluation domain.

    ahat: (P, M, K, d), bhat: (P, K, N, d)  ->  (P, M, N, d).

    Per prime and per evaluation lane this is an exact modular matmul — the
    core MXU workload: an Rq matrix product of any size becomes d batched
    integer matmuls per prime (SURVEY.md §2.16).
    """
    a = jnp.moveaxis(ahat, -1, 1)           # (P, d, M, K)
    b = jnp.moveaxis(bhat, -1, 1)           # (P, d, K, N)
    o = modmul_mm_p(a, b, np.asarray(plan.primes), extra_batch=1)
    return jnp.moveaxis(o, 1, -1)


def polyvec_inner_product(a: jax.Array, b: jax.Array, plan: NttPlan,
                          axis: int = -2) -> jax.Array:
    """<a, b> for vectors of ring elements: sum_i a_i * b_i.

    a, b: (..., m, d).  The sum over m folds into the evaluation domain
    (contraction per prime), so only one inverse transform runs.
    Replaces ``polynomial_vec_inner_product`` (reference ``util.rs:496-509``).
    """
    ahat = ntt_fwd(a, plan)
    bhat = ntt_fwd(b, plan)
    pv = np.asarray(plan.primes)
    prod = mod_pos(ahat * bhat, pv)                 # (P, ..., m, d)
    return ntt_inv_modq(_mod_sum_p(prod, pv, axis=axis), plan)


def _mod_sum(x: jax.Array, p: int, axis: int) -> jax.Array:
    """Exact sum mod p along an axis of values in [0, p): chunked so int32
    partial sums never overflow (p < 2^15 -> 2^16 terms per chunk)."""
    m = x.shape[axis]
    limit = 1 << 16
    if m <= limit:
        return mod_pos(jnp.sum(x, axis=axis), p)
    # move axis to front, chunk
    xm = jnp.moveaxis(x, axis, 0)
    pad = (-m) % limit
    if pad:
        xm = jnp.concatenate(
            [xm, jnp.zeros((pad,) + xm.shape[1:], xm.dtype)], axis=0)
    xm = xm.reshape(-1, limit, *xm.shape[1:])
    partial = mod_pos(jnp.sum(xm, axis=1), p)   # (< 2^31 each) -> [0, p)
    return mod_pos(jnp.sum(partial, axis=0), p)


def _mod_sum_p(x: jax.Array, primes, axis: int) -> jax.Array:
    """Vectorized ``_mod_sum`` over a leading prime axis: x is
    (P, ...) with x[i] in [0, primes[i]); `axis` must not be the prime
    axis (pass it negative or >= 1)."""
    pv = np.asarray(primes)
    ax = axis % x.ndim
    assert ax != 0, "cannot sum over the prime axis"
    m = x.shape[ax]
    limit = 1 << 16
    if m <= limit:
        return mod_pos(jnp.sum(x, axis=ax), pv)
    xm = jnp.moveaxis(x, ax, 1)                 # (P, m, ...)
    pad = (-m) % limit
    if pad:
        xm = jnp.concatenate(
            [xm, jnp.zeros(xm.shape[:1] + (pad,) + xm.shape[2:], xm.dtype)],
            axis=1)
    xm = xm.reshape(xm.shape[0], -1, limit, *xm.shape[2:])
    partial = mod_pos(jnp.sum(xm, axis=2), pv)
    return mod_pos(jnp.sum(partial, axis=1), pv)
