"""Generic coefficient-domain Zq tensors: single-limb (q < 2^15) or
two-limb (q up to ~2^33) — the layer that lifts the FULL protocol pipeline
to the reference's commented 2^32-scale modulus (``constants.rs:196``),
which the reference itself cannot run correctly (its NTT path silently
wraps at 2^64, ``algebraic.rs:417-419``).

Representation
--------------
* small q (<= ops.modmath.P_MAX): plain int32 arrays, canonical in [0, q).
* big q: ``Zq2(hi, lo)`` int32 pairs with value = hi * 2^16 + lo,
  lo in [0, 2^16), hi < 2^18 — a JAX pytree, so it flows through jit,
  scan, vmap and shard_map unchanged.

Everything heavy stays in the CRT evaluation domain (per-prime int32
lanes on the MXU, ops/ntt.py); this module only handles the canonical
boundary: residue <-> per-prime conversion, Garner folds back to [0, q),
exact modular add/sub/compare, and base-b digit extraction — all built
from int32 lane ops (TPU has no 64-bit integers).

The Garner-fold trick replaces every full-width scalar mulmod in the
protocol (psi-aggregation ``proofgen.rs:223-231``, the 2^{-1} scaling of h
``proofgen.rs:332-350``, the b'' constant-term check
``verification.rs:532-551``): compute per-prime residues of the exact
integer combination (magnitude << M = prod(primes)), then one mixed-radix
reconstruction mod q — no 66-bit products ever materialize.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .modmath import P_MAX, mod_pos

LIMB = 1 << 16
LIMB_MASK = LIMB - 1
Q_BIG_MAX = (1 << 33) - 1


class Zq2(NamedTuple):
    """Two-limb canonical residue tensor: value = hi * 2^16 + lo."""

    hi: jax.Array
    lo: jax.Array

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim


ZqT = Union[jax.Array, Zq2]


def is_big(q: int) -> bool:
    return q > P_MAX


def _q_limbs(q: int) -> tuple[int, int]:
    return q >> 16, q & LIMB_MASK


# ---------------------------------------------------------------------------
# Structural helpers (work on both representations)
# ---------------------------------------------------------------------------

def tmap(f, *xs: ZqT) -> ZqT:
    """Apply an array function limb-wise (or directly for small q)."""
    if isinstance(xs[0], Zq2):
        return Zq2(f(*(x.hi for x in xs)), f(*(x.lo for x in xs)))
    return f(*xs)


def reshape(x: ZqT, shape) -> ZqT:
    return tmap(lambda a: a.reshape(shape), x)


def swapaxes(x: ZqT, a: int, b: int) -> ZqT:
    return tmap(lambda t: jnp.swapaxes(t, a, b), x)


def moveaxis(x: ZqT, src: int, dst: int) -> ZqT:
    return tmap(lambda t: jnp.moveaxis(t, src, dst), x)


def index(x: ZqT, idx) -> ZqT:
    return tmap(lambda t: t[idx], x)


def stack(xs, axis=0) -> ZqT:
    if isinstance(xs[0], Zq2):
        return Zq2(jnp.stack([x.hi for x in xs], axis),
                   jnp.stack([x.lo for x in xs], axis))
    return jnp.stack(xs, axis)


def zeros(shape, q: int) -> ZqT:
    if is_big(q):
        return Zq2(jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.int32))
    return jnp.zeros(shape, jnp.int32)


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------

def from_py(x_int, q: int) -> ZqT:
    """Host ints (numpy int64/object array, values in [0, q)) -> ZqT."""
    if not is_big(q):
        return jnp.asarray(np.asarray(x_int, np.int64), jnp.int32)
    x = np.asarray(x_int, dtype=object)
    hi = np.vectorize(lambda v: int(v) >> 16, otypes=[np.int64])(x)
    lo = np.vectorize(lambda v: int(v) & LIMB_MASK, otypes=[np.int64])(x)
    return Zq2(jnp.asarray(hi, jnp.int32), jnp.asarray(lo, jnp.int32))


def to_py(x: ZqT) -> np.ndarray:
    """ZqT -> numpy int64 array of canonical residues (big q fits i64)."""
    if isinstance(x, Zq2):
        return (np.asarray(x.hi, np.int64) << 16) | np.asarray(x.lo, np.int64)
    return np.asarray(x, np.int64)


# ---------------------------------------------------------------------------
# Canonical arithmetic mod q (exact, int32 lanes)
# ---------------------------------------------------------------------------

def _geq_q(hi: jax.Array, lo: jax.Array, q: int) -> jax.Array:
    qh, ql = _q_limbs(q)
    return (hi > qh) | ((hi == qh) & (lo >= ql))


def _sub_q(hi: jax.Array, lo: jax.Array, q: int) -> tuple[jax.Array, jax.Array]:
    qh, ql = _q_limbs(q)
    lo2 = lo - ql
    borrow = (lo2 < 0).astype(jnp.int32)
    return hi - qh - borrow, lo2 + borrow * LIMB


def _carry_norm(hi: jax.Array, lo: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Renormalize so lo is in [0, 2^16) (lo may hold small overflow)."""
    c = lo >> 16
    return hi + c, lo - (c << 16)


def add(a: ZqT, b: ZqT, q: int) -> ZqT:
    if not is_big(q):
        return mod_pos(a + b, q)
    hi, lo = _carry_norm(a.hi + b.hi, a.lo + b.lo)
    geq = _geq_q(hi, lo, q)
    sh, sl = _sub_q(hi, lo, q)
    return Zq2(jnp.where(geq, sh, hi), jnp.where(geq, sl, lo))


def sub(a: ZqT, b: ZqT, q: int) -> ZqT:
    if not is_big(q):
        return mod_pos(a - b, q)
    lo = a.lo - b.lo
    borrow = (lo < 0).astype(jnp.int32)
    hi = a.hi - b.hi - borrow
    lo = lo + borrow * LIMB
    neg = hi < 0
    qh, ql = _q_limbs(q)
    lo2 = lo + ql
    c = (lo2 >> 16)
    hi2 = hi + qh + c
    lo2 = lo2 - (c << 16)
    return Zq2(jnp.where(neg, hi2, hi), jnp.where(neg, lo2, lo))


def eq(a: ZqT, b: ZqT) -> jax.Array:
    if isinstance(a, Zq2):
        return (a.hi == b.hi) & (a.lo == b.lo)
    return a == b


def all_eq(a: ZqT, b: ZqT) -> jax.Array:
    return jnp.all(eq(a, b))


def is_zero(x: ZqT) -> jax.Array:
    if isinstance(x, Zq2):
        return (x.hi == 0) & (x.lo == 0)
    return x == 0


def from_words32(hi_w: jax.Array, lo_w: jax.Array) -> Zq2:
    """32-bit word pair (value = hi_w * 2^32 + lo_w < 2^34) -> 16-bit-limb
    Zq2.  Used after u64 Barrett reductions, whose outputs are word pairs."""
    hi = ((hi_w.astype(jnp.uint32) << 16)
          | (lo_w.astype(jnp.uint32) >> 16)).astype(jnp.int32)
    lo = lo_w & LIMB_MASK
    return Zq2(hi, lo)


def from_signed(x: jax.Array, q: int) -> ZqT:
    """Signed int32 values (|x| < q, any sign) -> canonical residues."""
    if not is_big(q):
        return mod_pos(x, q)
    qh, ql = _q_limbs(q)
    pos_hi, pos_lo = x >> 16, x & LIMB_MASK          # for x >= 0
    m = -x                                           # for x < 0: q - m
    lo_n = ql - (m & LIMB_MASK)
    borrow = (lo_n < 0).astype(jnp.int32)
    hi_n = qh - (m >> 16) - borrow
    lo_n = lo_n + borrow * LIMB
    neg = x < 0
    return Zq2(jnp.where(neg, hi_n, pos_hi), jnp.where(neg, lo_n, pos_lo))


def to_signed_small(x: ZqT, q: int) -> jax.Array:
    """Canonical residues -> centered int32 (caller guarantees the centered
    value fits int32; true for every protocol tensor this is applied to:
    JL projections, digits, challenge polys)."""
    if not isinstance(x, Zq2):
        return jnp.where(x > q // 2, x - q, x)
    half = q // 2
    hh, hl = half >> 16, half & LIMB_MASK
    gt = (x.hi > hh) | ((x.hi == hh) & (x.lo > hl))
    qh, ql = _q_limbs(q)
    centered = (x.hi - qh) * LIMB + (x.lo - ql)
    plain = x.hi * LIMB + x.lo   # only sound where not gt (value < 2^31)
    return jnp.where(gt, centered, plain)


# ---------------------------------------------------------------------------
# CRT residues and Garner folds
# ---------------------------------------------------------------------------

def to_res(x: ZqT, primes) -> jax.Array:
    """Residues of the represented integer mod each prime: (P, ...) int32.
    Accepts canonical ZqT or plain (possibly signed) int32 arrays.
    Vectorized over the prime axis (one broadcast + one Barrett chain for
    the whole CRT stack)."""
    pv = np.asarray(primes)
    if isinstance(x, Zq2):
        limb_c = np.array([LIMB % int(p) for p in pv], np.int32) \
            .reshape((len(pv),) + (1,) * x.hi.ndim)
        hi_b = jnp.broadcast_to(x.hi, (len(pv),) + x.hi.shape)
        lo_b = jnp.broadcast_to(x.lo, (len(pv),) + x.lo.shape)
        return mod_pos(mod_pos(hi_b, pv) * limb_c + mod_pos(lo_b, pv), pv)
    return mod_pos(jnp.broadcast_to(x, (len(pv),) + x.shape), pv)


def garner_digits(res: jax.Array, plan) -> list[jax.Array]:
    """Per-prime residues (P, ...) -> mixed-radix digits v_k in [0, p_k).
    (Shared by ntt_inv and the scalar folds; plan.garner_inv precomputed.)"""
    P = len(plan.primes)
    v = [res[0]]
    for k in range(1, P):
        p = plan.primes[k]
        t = mod_pos(res[k] - v[0], p)
        for j in range(1, k):
            t = mod_pos(t * int(plan.garner_inv[j - 1, k]), p)
            t = mod_pos(t - v[j], p)
        t = mod_pos(t * int(plan.garner_inv[k - 1, k]), p)
        v.append(t)
    return v


def fold_digits_modq(v: list[jax.Array], plan, signed: bool = True) -> ZqT:
    """Mixed-radix digits -> canonical residue mod q.

    The represented integer X is in [0, M); with signed=True values above
    M/2 are interpreted as X - M (the negacyclic convolution sign range).
    """
    q = plan.q
    P = len(v)
    shape = v[0].shape
    if not is_big(q):
        out = jnp.zeros(shape, jnp.int32)
        for j in range(P):
            out = out + mod_pos(v[j] * plan.prefix_mod_q[j], q)
        if signed:
            gt = _digits_gt_mhalf(v, plan)
            out = out - jnp.where(gt, plan.m_mod_q, 0)
        return mod_pos(out, q)

    # big q: X mod q = (sum_j v_j * (prefix_j mod q)) mod q.  The exact u64
    # accumulation is < P * 2^15 * q < 2^53, so ONE Barrett reduction at the
    # end suffices — this keeps the traced graph ~6x smaller than a
    # per-stage mixed-radix ladder (XLA compile time scales with HLO count).
    from .bigq import _u64_mod_q
    from .modmath import u64_add, mul32x32_u64
    acc = (jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.int32))
    for j in range(P):
        c = int(plan.prefix_mod_q[j])          # < q < 2^34
        c_lo = np.int32(np.uint32(c & 0xFFFFFFFF))
        c_hi = c >> 32                          # 0..3
        ph, pl = mul32x32_u64(v[j], jnp.full(shape, c_lo, jnp.int32))
        if c_hi:
            ph = ph + v[j] * c_hi               # v_j * c_hi < 2^17: exact
        acc = u64_add(acc, (ph, pl))
    acc = _u64_mod_q(acc, q)
    # acc is X mod q as 32-bit words (value < q < 2^34)
    out = Zq2(((acc[0].astype(jnp.uint32) << 16)
               | (acc[1].astype(jnp.uint32) >> 16)).astype(jnp.int32),
              (acc[1] & LIMB_MASK))
    if signed:
        gt = _digits_gt_mhalf(v, plan)
        m_modq = from_py(np.asarray(plan.m_mod_q, object), q)
        corr = sub(out, tmap(lambda t: jnp.broadcast_to(t, shape), m_modq), q)
        out = Zq2(jnp.where(gt, corr.hi, out.hi),
                  jnp.where(gt, corr.lo, out.lo))
    return out


def _digits_gt_mhalf(v: list[jax.Array], plan) -> jax.Array:
    """Lexicographic (most-significant-digit-last) compare vs floor(M/2)."""
    gt = jnp.zeros(v[0].shape, bool)
    for j in range(len(v)):
        mj = plan.m_half_digits[j]
        gt = (v[j] > mj) | ((v[j] == mj) & gt)
    return gt


def fold_res_modq(res: jax.Array, plan, signed: bool = True) -> ZqT:
    """Per-prime residues of an integer |X| < M/2 -> X mod q, canonical."""
    return fold_digits_modq(garner_digits(res, plan), plan, signed)


# ---------------------------------------------------------------------------
# Base-b digit extraction for two-limb residues
# ---------------------------------------------------------------------------

def _limb_divmod(hi: jax.Array, lo: jax.Array, b: int):
    """Exact (v div b, v mod b) for two-limb v and python const b <= 2^15.
    Two-digit long division in base 2^16 — all intermediates < 2^31."""
    q1 = hi // b
    r1 = hi - q1 * b
    u = r1 * LIMB + lo                    # < b * 2^16 <= 2^31
    q0 = u // b
    r0 = u - q0 * b
    return q1, q0, r0                     # quotient = (q1, q0), remainder r0


def decompose_balanced_big(x: Zq2, base: int, ndigits: int, q: int) -> jax.Array:
    """Balanced base-b digits of the *centered* representative of x mod q:
    signed int32 digits d_k in (-b/2, b/2], sum d_k b^k == x (mod q) when
    b^ndigits covers [0, q) (params.exact_digits sizing).

    Two-limb counterpart of ops.decompose mode='exact' (the only mode that
    is meaningful at big q: the reference's quirky centered_rep exists for
    bit-compat with a configuration the reference can actually run)."""
    assert base <= (1 << 15), f"base {base} too large for limb divmod"
    b = int(base)
    half_b = b // 2
    # center: magnitude + sign
    halfq = q // 2
    hh, hl = halfq >> 16, halfq & LIMB_MASK
    neg = (x.hi > hh) | ((x.hi == hh) & (x.lo > hl))
    qh, ql = _q_limbs(q)
    # q - x (valid where neg; x > q/2 > 0 there)
    lo_m = ql - x.lo
    borrow = (lo_m < 0).astype(jnp.int32)
    hi_m = qh - x.hi - borrow
    lo_m = lo_m + borrow * LIMB
    mhi = jnp.where(neg, hi_m, x.hi)
    mlo = jnp.where(neg, lo_m, x.lo)
    sign = jnp.where(neg, -1, 1)

    digits = []
    for _ in range(int(ndigits)):
        q1, q0, r0 = _limb_divmod(mhi, mlo, b)
        adj = r0 > half_b
        digits.append(jnp.where(adj, r0 - b, r0))
        # m = (m - dig) / b = quotient + (1 if dig < 0 else 0)
        q0 = q0 + adj.astype(jnp.int32)
        c = q0 >> 16
        mhi, mlo = q1 + c, q0 - (c << 16)
    return jnp.stack(digits, axis=0) * sign[None]


# ---------------------------------------------------------------------------
# Signed 64-bit emulation (for exact small-count recombinations)
# ---------------------------------------------------------------------------

def i64_from_i32(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sign-extended (hi, lo) two's-complement pair from int32."""
    return x >> 31, x


def i64_shl(x: tuple, k: int) -> tuple:
    from .modmath import u64_shl
    return u64_shl(x, k)


def i64_add(x: tuple, y: tuple) -> tuple:
    from .modmath import u64_add
    return u64_add(x, y)       # two's complement: same as unsigned add


def i64_to_i32_exact(x: tuple) -> jax.Array:
    """Low word of an i64 whose value is known to fit int32."""
    return x[1]
