"""Large-modulus (q up to ~2^33) ring arithmetic on int32 lanes.

The reference's alternative modulus ``find_suitable_prime((1<<32)-1)``
(= 4294967311, the commented line at ``constants.rs:196``) overflows its
own NTT path: concrete-ntt's u64 output wraps at 2^64 and the
two's-complement re-interpretation at ``algebraic.rs:417-419`` silently
corrupts convolution results once coefficients exceed 2^63.  This module
provides an *exact* big-q negacyclic polymul on TPU-native int32 lanes:

  * residues are two-limb tensors ``(hi, lo)`` with value = hi*2^16 + lo
    (lo in [0, 2^16), hi < 2^17 for q < 2^33);
  * forward transforms reduce each limb mod the small CRT primes (cheap
    int32 ops), the eval-domain math is unchanged (mod-p lanes);
  * reconstruction runs Garner mixed-radix digits exactly as the small-q
    path, then folds the digits mod q with emulated-u64 Barrett reduction.

This covers the NTT/polymul layer (the part the reference breaks); lifting
the full protocol pipeline onto the limb representation is tracked as
roadmap work.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..params import select_crt_primes
from . import ntt as ntt_ops
from .modmath import (mod_pos, u64_add, u64_sub, u64_shr, u64_shl,
                      u64_geq_u64, mul32x32_u64)

LIMB = 1 << 16
LIMB_MASK = LIMB - 1
Q_BIG_MAX = (1 << 33) - 1


def split_limbs(x_int) -> tuple[jax.Array, jax.Array]:
    """Host-side numpy object/int64 array of residues -> (hi, lo) int32."""
    x = np.asarray(x_int, dtype=object)
    hi = np.vectorize(lambda v: int(v) >> 16, otypes=[np.int64])(x)
    lo = np.vectorize(lambda v: int(v) & LIMB_MASK, otypes=[np.int64])(x)
    return jnp.asarray(hi, jnp.int32), jnp.asarray(lo, jnp.int32)


def join_limbs(hi, lo) -> np.ndarray:
    """(hi, lo) int32 -> numpy object array of Python-int residues."""
    h = np.asarray(hi, np.int64)
    l = np.asarray(lo, np.int64)
    out = np.empty(h.shape, dtype=object)
    it = np.nditer(h, flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        out[idx] = (int(h[idx]) << 16) | int(l[idx])
    return out


@lru_cache(maxsize=None)
def big_plan(q: int, d: int = 64, max_accum: int = 1 << 12):
    """CRT plan for big q (enough primes that max_accum-length convolution
    sums reconstruct exactly)."""
    assert q <= Q_BIG_MAX
    primes = select_crt_primes(q, d, max_accum)
    # Build transform matrices for this prime set via the same machinery:
    from .ntt import NttPlan, _primitive_root
    P = len(primes)
    V = np.zeros((P, d, d), np.int32)
    W = np.zeros((P, d, d), np.int32)
    for pi, p in enumerate(primes):
        g = _primitive_root(p)
        phi = pow(g, (p - 1) // (2 * d), p)
        assert pow(phi, d, p) == p - 1
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
        prefix.append(acc)  # full python ints; folded mod q in u64 path
        acc *= p
    return NttPlan(q=q, d=d, primes=primes, V=V, W=W, garner_inv=ginv,
                   m_half_digits=tuple(mh_digits),
                   prefix_mod_q=tuple(pr % q for pr in prefix),
                   m_mod_q=M % q)


# ---------------------------------------------------------------------------
# u64-emulated mod-q helpers (q a static python int < 2^33)
# ---------------------------------------------------------------------------

def _u64_mulmod_const(x: tuple, c: int, q: int) -> tuple:
    """(x * c) mod q for emulated-u64 x < q < 2^34 and python const
    c < 2^15 (product < 2^49)."""
    ph, pl = mul32x32_u64(x[1], jnp.full_like(x[1], c))   # lo*c < 2^47
    hc = x[0] * c                                          # hi < 4 -> < 2^17
    v = (ph + hc, pl)                                      # + hi*c*2^32
    return _u64_mod_q(v, q)


def _u64_mod_q(v: tuple, q: int) -> tuple:
    """v mod q for emulated-u64 v < 2^63 and python const 2^24 < q < 2^34.

    Barrett with a truncated 96-bit product: t ~= floor(v * floor(2^64/q)
    / 2^64) computed from four 32x16 partial products with carries dropped
    (only ever underestimating the true quotient), then a bounded
    conditional-subtract ladder.
    """
    m = (1 << 64) // q            # < 2^40 for q > 2^24; here q > 2^32 -> m < 2^32
    m1, m0 = (m >> 16) & 0xFFFF, m & 0xFFFF
    assert m < (1 << 32), "q must exceed 2^32 for this Barrett layout"
    vh = v[0]
    vl = v[1]
    # v*m = vh*m1*2^48 + vh*m0*2^32 + vl*m1*2^16 + vl*m0 ; t = (v*m) >> 64
    A = mul32x32_u64(vh, jnp.full_like(vh, m1))   # * 2^48
    B = mul32x32_u64(vh, jnp.full_like(vh, m0))   # * 2^32
    C = mul32x32_u64(vl, jnp.full_like(vl, m1))   # * 2^16
    # contributions to bits >= 64 (dropping sub-word carries: t is a lower
    # bound of the true quotient, fixed by the subtract ladder)
    tA = u64_shr(A, 16)
    tB = u64_shr(B, 32)
    tC = (jnp.zeros_like(vh),
          (C[0].astype(jnp.uint32) >> 16).astype(jnp.int32))  # C >> 48
    t = u64_add(u64_add(tA, tB), tC)
    t_lo = t[1]                                   # quotient < 2^31: fits
    # r = v - t*q  with q = qh*2^32 + ql, ql = qa*2^16 + qb
    qh_w, ql_w = (q >> 32) & 0xFFFFFFFF, q & 0xFFFFFFFF
    qa, qb = (ql_w >> 16) & 0xFFFF, ql_w & 0xFFFF
    P1 = mul32x32_u64(t_lo, jnp.full_like(t_lo, qb))
    P2 = mul32x32_u64(t_lo, jnp.full_like(t_lo, qa))      # * 2^16
    tq = u64_add(P1, u64_shl(P2, 16))
    tq = (tq[0] + t_lo * qh_w, tq[1])                     # + t*qh*2^32
    r = u64_sub(v, tq)
    hi, lo = r
    # residual < 8q after the truncated Barrett (3 dropped shift floors +
    # 1 dropped partial product + Barrett truncation, each contributing
    # < q) — a binary conditional-subtract ladder (8q < 2^37 fits u64)
    for mult in (8, 4, 2, 1):
        c = mult * q
        ch, cl = (c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF
        geq = u64_geq_u64((hi, lo), ch, cl)
        sub = u64_sub((hi, lo), (jnp.full_like(hi, np.int32(np.uint32(ch))),
                                 jnp.full_like(lo, np.int32(np.uint32(cl)))))
        hi = jnp.where(geq, sub[0], hi)
        lo = jnp.where(geq, sub[1], lo)
    return hi, lo


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def ntt_fwd_big(hi: jax.Array, lo: jax.Array, plan) -> jax.Array:
    """Two-limb residues (hi*2^16+lo) -> eval domain (P, ..., d)."""
    shape = hi.shape
    h2 = hi.reshape(-1, plan.d)
    l2 = lo.reshape(-1, plan.d)
    outs = []
    for pi, p in enumerate(plan.primes):
        xp = mod_pos(mod_pos(h2, p) * (LIMB % p) + mod_pos(l2, p), p)
        from .modmath import modmul_mm
        V = jnp.asarray(plan.V[pi])
        outs.append(modmul_mm(xp, V, p).reshape(shape))
    return jnp.stack(outs)


def ntt_inv_big(xhat: jax.Array, plan) -> tuple[jax.Array, jax.Array]:
    """Eval domain -> two-limb residues mod q (exact for |X| < M/2)."""
    from .modmath import modmul_mm
    P = plan.n_primes
    q = plan.q
    shape = xhat.shape[1:]
    res = []
    for pi, p in enumerate(plan.primes):
        W = jnp.asarray(plan.W[pi])
        res.append(modmul_mm(xhat[pi].reshape(-1, plan.d), W, p)
                   .reshape(shape))
    # Garner digits (identical to the small-q path: everything mod p_i)
    v = [res[0]]
    for k in range(1, P):
        p = plan.primes[k]
        t = mod_pos(res[k] - v[0], p)
        for j in range(1, k):
            t = mod_pos(t * int(plan.garner_inv[j - 1, k]), p)
            t = mod_pos(t - v[j], p)
        t = mod_pos(t * int(plan.garner_inv[k - 1, k]), p)
        v.append(t)

    # accumulate X mod q most-significant digit first:
    # res = v_{P-1}; res = res*p_j + v_j (mod q), j = P-2 .. 0
    acc = (jnp.zeros(shape, jnp.int32), v[P - 1])
    for j in range(P - 2, -1, -1):
        acc = _u64_mulmod_const(acc, int(plan.primes[j]), q)
        acc = _u64_mod_q(u64_add(acc, (jnp.zeros(shape, jnp.int32), v[j])), q)

    # signed correction: if mixed-radix value > M/2 subtract M mod q
    gt = jnp.zeros(shape, bool)
    for j in range(P):
        mj = plan.m_half_digits[j]
        gt = (v[j] > mj) | ((v[j] == mj) & gt)
    mq = plan.m_mod_q
    qh = np.int32((q >> 32) & 0xFFFFFFFF)
    ql = np.int32(q & 0xFFFFFFFF)
    # acc - (M mod q) where gt, wrapping by +q when it would go negative
    hiu = acc[0].astype(jnp.uint32)
    lou = acc[1].astype(jnp.uint32)
    mh = np.uint32((mq >> 32) & 0xFFFFFFFF)
    ml = np.uint32(mq & 0xFFFFFFFF)
    # value < mq ? then add q first
    lt = (hiu < jnp.uint32(mh)) | ((hiu == jnp.uint32(mh))
                                   & (lou < jnp.uint32(ml)))
    addq = gt & lt
    lo2 = (lou + jnp.where(addq, jnp.uint32(ql), jnp.uint32(0)))
    carry = (lo2 < lou).astype(jnp.uint32)
    hi2 = hiu + jnp.where(addq, jnp.uint32(qh), jnp.uint32(0)) + carry
    borrow = (lo2 < jnp.where(gt, jnp.uint32(ml), jnp.uint32(0))).astype(jnp.uint32)
    lo3 = (lo2 - jnp.where(gt, jnp.uint32(ml), jnp.uint32(0))).astype(jnp.int32)
    hi3 = (hi2 - jnp.where(gt, jnp.uint32(mh), jnp.uint32(0)) - borrow).astype(jnp.int32)

    # split into 16-bit limbs
    hi_out = ((hi3.astype(jnp.uint32) << 16)
              | (lo3.astype(jnp.uint32) >> 16)).astype(jnp.int32)
    lo_out = (lo3.astype(jnp.uint32) & jnp.uint32(LIMB_MASK)).astype(jnp.int32)
    return hi_out, lo_out


def negacyclic_polymul_big(a_int, b_int, q: int, d: int = 64):
    """Exact (a*b) in Rq for big q: host int arrays in [0, q) -> numpy
    object array of residues.  The part of the 2^32-scale configuration the
    reference cannot compute correctly."""
    plan = big_plan(q, d)
    ah, al = split_limbs(a_int)
    bh, bl = split_limbs(b_int)
    ahat = ntt_fwd_big(ah, al, plan)
    bhat = ntt_fwd_big(bh, bl, plan)
    prod = ntt_ops.eval_mul(ahat, bhat, plan)
    hi, lo = ntt_inv_big(prod, plan)
    return join_limbs(hi, lo)
