"""Exact modular arithmetic primitives for TPU (int32 lanes, int8 MXU).

The TPU has no 64-bit integers and its MXU multiplies int8 (accumulating in
int32) or floats.  Everything here is built so that **no intermediate ever
exceeds int32 range**, making results exact on TPU and CPU alike:

  * values live in [0, p) with p <= P_MAX < 2**15, so a product of two
    reduced values is < 2**30;
  * matmul contractions split operands into two signed 8-bit limbs and use
    native int8 x int8 -> int32 ``dot_general`` (the MXU path), recombining
    with per-limb modular reduction.

This module replaces the reference's i128 scalar arithmetic in ``Zq``
(``/root/reference/src/algebraic.rs:25-297``) with batched lane arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Largest modulus for which the int8 limb decomposition below is valid:
# x <= P_MAX-1 must satisfy hi-limb <= 127 after centering the lo limb.
# x - lo <= x + 128 <= 127*256 + 127 + ... we require x + 128 <= 127*256+128
P_MAX = 32513  # primes used must be <= this; 32512 = 127*256 + 128


def mod_pos(x: jax.Array, m) -> jax.Array:
    """x mod m with nonnegative result.  Mirrors ``mod_positive``
    (reference ``util.rs:16-23``).

    Fast path (static m <= P_MAX, int32 x): an exact two-step float32
    Barrett — TPU has no integer divide, so ``jnp.remainder`` lowers to a
    long emulated sequence that made the polymul kernel 2.2x slower than
    this (bench_logs/diag_mod round 4).  Exactness argument:

      step 1:  q1 = round(fl(x) * fl(1/m));  r1 = x - q1*m.
               fl() errors bound |q1 - x/m| <= 3|x|*2^-24/m + 0.5, so with
               |x| <= 2^31 - 2^20 and m <= P_MAX < 2^15:
               |r1| <= (3*|x|*2^-24 + 0.5m) + 0.5m < 2^17, and q1*m fits
               int32 (<= |x| + 2^17).
      step 2:  same on r1 — now |r1| < 2^24 so fl(r1) is EXACT and
               |r2| <= (m+1)/2; two conditional fixups land in [0, m).

    Every int32 value in this codebase is below the |x| bound by
    construction (the largest are _mod_sum's chunked partials,
    2^16 * (P_MAX-1) = 2^31 - 2^26).  float32 mul and round-half-even are
    correctly rounded and deterministic on CPU and TPU alike, so results
    stay bit-identical across backends (asserted by the parity suites)."""
    if isinstance(m, (int, np.integer)) and 1 < m <= P_MAX \
            and x.dtype == jnp.int32:
        m32, inv = np.int32(m), np.float32(1.0 / m)
        m_min = int(m)
    elif isinstance(m, np.ndarray) and m.ndim == 1 \
            and x.ndim >= 1 and m.shape[0] == x.shape[0] \
            and (1 < m).all() and (m <= P_MAX).all() \
            and x.dtype == jnp.int32:
        # static per-prime modulus vector broadcast down x's leading axis —
        # ONE vector op replaces an unrolled per-prime Python loop (the
        # big-q prover traced 92K StableHLO ops of 6x-duplicated arithmetic)
        bshape = (m.shape[0],) + (1,) * (x.ndim - 1)
        m32 = m.astype(np.int32).reshape(bshape)
        inv = np.array([np.float32(1.0 / int(v)) for v in m],
                       np.float32).reshape(bshape)
        m_min = int(m.min())
    else:
        if isinstance(m, np.ndarray) and m.ndim == 1:
            # A 1-D modulus vector that missed the fast path would silently
            # broadcast down x's TRAILING axis under jnp.remainder —
            # per-element moduli instead of per-prime, wrong values with no
            # error (ADVICE r4).  Refuse instead.
            raise ValueError(
                f"mod_pos: 1-D modulus vector shape {m.shape} does not hit "
                f"the per-prime fast path for x shape {x.shape} dtype "
                f"{x.dtype} (need m.shape[0] == x.shape[0], all m <= "
                f"{P_MAX}, int32 x); broadcasting would be per-last-axis "
                f"and silently wrong")
        return jnp.remainder(x, jnp.asarray(m, dtype=x.dtype))
    q1 = jnp.round(x.astype(jnp.float32) * inv).astype(jnp.int32)
    r1 = x - q1 * m32
    if m_min > 1536:
        # ONE-step suffices (round 5): |q1 - x/m| <= 0.5 + 3|x|*2^-24/m
        # < 0.5 + 3*(2^31-2^20)*2^-24/1537 < 0.99, so |r1| < m — the int
        # subtraction is exact regardless of fl(x)'s rounding, and one
        # conditional add canonicalizes.  Halves the reduction cost for
        # every CRT prime (~2^15) and every protocol q > 1536.
        return jnp.where(r1 < 0, r1 + m32, r1)
    q2 = jnp.round(r1.astype(jnp.float32) * inv).astype(jnp.int32)
    r2 = r1 - q2 * m32
    r2 = jnp.where(r2 < 0, r2 + m32, r2)
    return jnp.where(r2 >= m32, r2 - m32, r2)


def split_i8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split int32 values in [0, P_MAX) into (hi, lo) signed int8 limbs with
    x == hi * 256 + lo, lo in [-128, 128), hi in [0, 128)."""
    lo = ((x + 128) & 255) - 128
    hi = (x - lo) >> 8
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _dot_i8(a: jax.Array, b: jax.Array, dn) -> jax.Array:
    return jax.lax.dot_general(a, b, dimension_numbers=dn,
                               preferred_element_type=jnp.int32)


# Contraction-size limit for a single int8 pass: |limb product| <= 128*128,
# so the int32 accumulator is safe for up to 2**31 / 2**14 = 131072 terms.
CHUNK = 1 << 16


def modmul_mm(a: jax.Array, b: jax.Array, p, *, batch_dims=0) -> jax.Array:
    """Exact (a @ b) mod p on the MXU.

    a: (..., B, m, n) int32 in [0, p);  b: (..., B, n, k) int32 in [0, p);
    leading `batch_dims` axes are batched.  Returns (..., B, m, k) in [0, p).

    p must be <= P_MAX.  Contractions longer than CHUNK are chunked with a
    modular reduction between chunks.
    """
    n = a.shape[-1]
    if n > CHUNK:
        nchunks = (n + CHUNK - 1) // CHUNK
        acc = None
        for c in range(nchunks):
            lo_i, hi_i = c * CHUNK, min((c + 1) * CHUNK, n)
            part = modmul_mm(a[..., lo_i:hi_i], b[..., lo_i:hi_i, :], p,
                             batch_dims=batch_dims)
            acc = part if acc is None else mod_pos(acc + part, p)
        return acc

    bd = tuple(range(batch_dims))
    dn = (((a.ndim - 1,), (b.ndim - 2,)), (bd, bd))
    a_hi, a_lo = split_i8(a)
    b_hi, b_lo = split_i8(b)
    p11 = _dot_i8(a_hi, b_hi, dn)
    p10 = _dot_i8(a_hi, b_lo, dn) + _dot_i8(a_lo, b_hi, dn)
    p00 = _dot_i8(a_lo, b_lo, dn)
    # |p10| can reach 2 * n * 2**14 = 2**31 for n = CHUNK: halve the chunk
    # bound via the fact the two addends are each < n * 2**14 <= 2**30. Safe.
    c16 = (1 << 16) % int(p)
    c8 = (1 << 8) % int(p)
    r = mod_pos(mod_pos(p11, p) * c16, p) + mod_pos(mod_pos(p10, p) * c8, p) \
        + mod_pos(p00, p)
    return mod_pos(r, p)


def _pshape(v: np.ndarray, ndim: int) -> np.ndarray:
    """(P,) static vector -> broadcastable (P, 1, ..., 1) of rank ndim."""
    return v.reshape((v.shape[0],) + (1,) * (ndim - 1))


def mod_pos_small(x: jax.Array, primes) -> jax.Array:
    """One-step float32 Barrett, result in [0, m).

    EXACT for int32 |x| < 2^24 with every modulus m >= 64: fl(x) is exact,
    so the rounded quotient errs by < 0.5 + (2^24/64)*2^-23 < 0.6 and one
    conditional add lands the remainder in [0, m).  Half the cost of the
    general two-step ``mod_pos`` — used on the d=64 transform dot outputs
    (|.| <= 64*127*127 < 2^21).  primes: static (P,) vector matching x's
    leading axis."""
    pv = np.asarray(primes).reshape(-1)
    assert (pv >= 64).all()
    if pv.size == 1:
        # plain scalars — Pallas kernels reject captured array constants
        m32 = np.int32(pv[0])
        inv = np.float32(1.0 / int(pv[0]))
    else:
        bshape = (pv.shape[0],) + (1,) * (x.ndim - 1)
        m32 = pv.astype(np.int32).reshape(bshape)
        inv = np.array([np.float32(1.0 / int(v)) for v in pv],
                       np.float32).reshape(bshape)
    q1 = jnp.round(x.astype(jnp.float32) * inv).astype(jnp.int32)
    r = x - q1 * m32
    return jnp.where(r < 0, r + m32, r)


# Contraction-length tiers for the PACKED one-dot scheme below.  Limb
# magnitudes: a_hi, c_hi, b_hi in [0, 127]; a_lo, c_lo, b_lo in [-128, 127].
#   P1 = a_hi@c_hi + a_lo@b_hi  in  n * [-16256, 32258]
#   P0 = a_hi@c_lo + a_lo@b_lo  in  n * [-32512, 32513]
# tier 1 (n <= 256):  |256*P1 + P0| <= n*8290561 < 2^31 - 2^20 -> the
#   recombination fits int32 and ONE two-step mod_pos is exact.
# tier 2 (n <= 520):  |P1| <= n*32258 < 2^24 -> one-step mod_pos_small on
#   P1 is exact; |(P1 mod p)<<8| + |P0| < 2^23 + 2^25 -> one two-step.
# tier 3 (n <= 65536): two-step mod_pos on each of P1, P0 (|.| <= n*32513
#   <= 2^31 - 2^20 for n <= 65536); 256*(p-1) + (p-1) < 2^24 -> final
#   one-step.  The int8 dot accumulator itself is safe to n = 65536
#   (n * 32513 < 2^31), so a SINGLE dot covers every tier.
PACK_T1 = 256
PACK_T2 = 520


def modmul_mm_p(a: jax.Array, b: jax.Array, primes, *,
                extra_batch: int = 0) -> jax.Array:
    """Exact per-prime (a @ b) mod primes[i] as ONE batched int8 MXU dot.

    a: (P, ..., m, n) int32 with a[i] in [0, primes[i]);
    b: (P, ..., n, k) likewise; `extra_batch` additional batch axes follow
    the prime axis.  Equivalent to stacking per-prime modular matmuls, but
    the whole CRT stack runs as a single dot_general + a 1-3-step
    vectorized reduction — compile-time and dispatch cost stop scaling
    with the number of primes.

    PACKED limb scheme (round 5): with c = (256*b) mod p,
        a @ b = (256*a_hi + a_lo) @ b = a_hi @ c + a_lo @ b   (mod p),
    and splitting c and b into int8 limbs gives
        [a_hi | a_lo] @ [[c_hi | c_lo], [b_hi | b_lo]] = [P1 | P0],
        a @ b = 256*P1 + P0  (mod p).
    The 4 limb-products collapse into ONE int8 dot of shape
    (..., m, 2n) @ (..., 2n, 2k) — for the d=64 transforms that is a full
    native 128x128 MXU tile (4x the packing of 64-wide dots) — and the
    4-6 per-element reductions of the old scheme drop to 1 (n <= 256),
    2 (n <= 520) or 3 (n <= 65536).  When b is a static twiddle matrix,
    XLA constant-folds the c/limb preparation entirely.
    """
    primes = np.asarray(primes, np.int64)
    n = a.shape[-1]
    if n > CHUNK:
        nchunks = (n + CHUNK - 1) // CHUNK
        acc = None
        for c in range(nchunks):
            lo_i, hi_i = c * CHUNK, min((c + 1) * CHUNK, n)
            part = modmul_mm_p(a[..., lo_i:hi_i], b[..., lo_i:hi_i, :],
                               primes, extra_batch=extra_batch)
            acc = part if acc is None else mod_pos(acc + part, primes)
        return acc

    bd = tuple(range(1 + extra_batch))
    dn = (((a.ndim - 1,), (b.ndim - 2,)), (bd, bd))
    m, k = a.shape[-2], b.shape[-1]
    a_hi, a_lo = split_i8(a)
    b_hi, b_lo = split_i8(b)
    if m <= k:
        # DUAL fold — 256 folded into the a side (a @ b = c_a @ b_hi-part):
        # the shift+reduce+extra-splits prep runs on the SMALLER operand
        # (the verifier is full of m=1 vector-matrix products where b-side
        # prep would dominate).  P1/P0 stack on the M axis.
        c = mod_pos_small(a << 8, primes)
        c_hi, c_lo = split_i8(c)
        a2 = jnp.concatenate(
            [jnp.concatenate([c_hi, a_hi], axis=-1),
             jnp.concatenate([c_lo, a_lo], axis=-1)], axis=-2)  # (..,2m,2n)
        w = jnp.concatenate([b_hi, b_lo], axis=-2)              # (..,2n, k)
        d = _dot_i8(a2, w, dn)                                  # (..,2m, k)
        p1, p0 = d[..., :m, :], d[..., m:, :]
    else:
        # c = (256*b) mod p: b < 2^15 so b<<8 < 2^23 — one-step exact
        c = mod_pos_small(b << 8, primes)
        c_hi, c_lo = split_i8(c)
        a2 = jnp.concatenate([a_hi, a_lo], axis=-1)            # (..., m, 2n)
        w = jnp.concatenate([jnp.concatenate([c_hi, b_hi], axis=-2),
                             jnp.concatenate([c_lo, b_lo], axis=-2)],
                            axis=-1)                           # (..., 2n, 2k)
        d = _dot_i8(a2, w, dn)                                 # (..., m, 2k)
        p1, p0 = d[..., :k], d[..., k:]
    if n <= PACK_T1:
        return mod_pos((p1 << 8) + p0, primes)
    if n <= PACK_T2:
        return mod_pos((mod_pos_small(p1, primes) << 8) + p0, primes)
    return mod_pos_small((mod_pos(p1, primes) << 8) + mod_pos(p0, primes),
                         primes)


def modmul_point(a: jax.Array, b: jax.Array, p) -> jax.Array:
    """Elementwise (a * b) mod p for values in [0, p), p <= P_MAX (product
    < 2**30, exact in int32)."""
    return mod_pos(a * b, p)


def mod_scale(a: jax.Array, s, p) -> jax.Array:
    """(a * s) mod p for a scalar (or broadcastable) multiplier in [0, p)."""
    return mod_pos(a * s, p)


# ---------------------------------------------------------------------------
# Emulated 64-bit unsigned accumulation on int32 lanes.
#
# Used for exact norm sums (fixing the reference's Check-14 f64 precision bug,
# README.md:10) and for the big-q code path.  A u64 is a pair (hi, lo) of
# int32 arrays interpreted as uint32 words.
# ---------------------------------------------------------------------------

def u64_make(lo: jax.Array) -> tuple[jax.Array, jax.Array]:
    return jnp.zeros_like(lo), lo


def _u32_add(a, b):
    """uint32 add with carry out, on int32 carriers (bitwise-exact wraparound)."""
    s = (a + b).astype(jnp.int32)  # wraps like uint32
    # carry iff unsigned sum overflowed: compare as unsigned via bias trick
    au = a.astype(jnp.uint32)
    su = s.astype(jnp.uint32)
    carry = (su < au).astype(jnp.int32)
    return s, carry


def u64_add(x: tuple, y: tuple) -> tuple:
    xh, xl = x
    yh, yl = y
    lo, c = _u32_add(xl, yl)
    hi = (xh + yh + c).astype(jnp.int32)
    return hi, lo


def u64_add_u32(x: tuple, y_lo: jax.Array) -> tuple:
    return u64_add(x, (jnp.zeros_like(y_lo), y_lo))


def mul32x32_u64(a: jax.Array, b: jax.Array) -> tuple:
    """Full 64-bit product of two nonneg int32 values (as u64 pair), via
    16-bit half-words — no 64-bit hardware ops required."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    a_lo, a_hi = a & 0xFFFF, a >> 16
    b_lo, b_hi = b & 0xFFFF, b >> 16
    ll = a_lo * b_lo                      # < 2**32, exact in uint32
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # lh <= (2**16-1)**2 < 2**32 - 2**17; + (ll>>16) < 2**16: no overflow.
    mid = lh + (ll >> 16)
    mid_sum = mid + hl                    # may wrap: detect carry unsigned
    carry = (mid_sum < mid).astype(jnp.uint32)
    lo = (ll & 0xFFFF) | ((mid_sum & 0xFFFF) << 16)
    hi = hh + (mid_sum >> 16) + (carry << 16)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def u64_sum(values_sq: jax.Array, axis=None) -> tuple:
    """Exact sum of nonneg int32 values (< 2**31) as an emulated u64.

    Splits each value into 16-bit halves, sums each half in int32 over chunks
    small enough to be exact, then recombines with carries.
    """
    x = values_sq.reshape(-1)
    lo16 = x & 0xFFFF
    hi16 = x >> 16          # < 2**15
    # chunk so that int32 partial sums cannot overflow: 2**16 values * 2**16
    csz = 1 << 15
    npad = (-x.shape[0]) % csz
    lo16 = jnp.pad(lo16, (0, npad)).reshape(-1, csz)
    hi16 = jnp.pad(hi16, (0, npad)).reshape(-1, csz)
    lo_part = jnp.sum(lo16, axis=1)  # <= 2**15 * 2**16 = 2**31 - eps ... keep
    hi_part = jnp.sum(hi16, axis=1)  # <= 2**15 * 2**15 = 2**30
    acc = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    def body(i, acc):
        a = u64_add(acc, (jnp.zeros((), jnp.int32), lo_part[i]))
        hp = hi_part[i]
        return u64_add(a, ((hp >> 16).astype(jnp.int32),
                           ((hp << 16)).astype(jnp.int32)))

    acc = jax.lax.fori_loop(0, lo_part.shape[0], body, acc)
    return acc


def u64_sub(x: tuple, y: tuple) -> tuple:
    """x - y for emulated u64 (wraps mod 2^64 like hardware)."""
    xh, xl = x
    yh, yl = y
    xlu = xl.astype(jnp.uint32)
    ylu = yl.astype(jnp.uint32)
    lo = (xlu - ylu).astype(jnp.int32)
    borrow = (xlu < ylu).astype(jnp.int32)
    hi = (xh - yh - borrow).astype(jnp.int32)
    return hi, lo


def u64_shr(x: tuple, k: int) -> tuple:
    """Logical right shift by static k in {1..31} or exactly 32."""
    hi, lo = x
    hiu = hi.astype(jnp.uint32)
    lou = lo.astype(jnp.uint32)
    if k == 32:
        return jnp.zeros_like(hi), hiu.astype(jnp.int32)
    nlo = (lou >> k) | (hiu << (32 - k))
    nhi = hiu >> k
    return nhi.astype(jnp.int32), nlo.astype(jnp.int32)


def u64_geq_u64(x: tuple, yh: int, yl: int) -> jax.Array:
    """x >= (yh<<32|yl) for python-int words."""
    hiu = x[0].astype(jnp.uint32)
    lou = x[1].astype(jnp.uint32)
    return (hiu > jnp.uint32(yh)) | ((hiu == jnp.uint32(yh))
                                     & (lou >= jnp.uint32(yl)))


def u64_shl(x: tuple, k: int) -> tuple:
    """Left shift an emulated u64 by a static k in {1..31} or exactly 32."""
    hi, lo = x
    hiu = hi.astype(jnp.uint32)
    lou = lo.astype(jnp.uint32)
    if k == 32:
        return lou.astype(jnp.int32), jnp.zeros_like(lo)
    nhi = (hiu << k) | (lou >> (32 - k))
    nlo = lou << k
    return nhi.astype(jnp.int32), nlo.astype(jnp.int32)


def sum_sq_u64(x: jax.Array) -> tuple:
    """Exact sum of squares of int32 values (any sign), as emulated u64
    (exact when the true sum < 2**64).  Used for JL-projection and witness
    norm checks where squares exceed int32 range."""
    a = jnp.abs(x).reshape(-1)
    hi, lo = mul32x32_u64(a, a)           # per-element a^2 as u64 pairs
    lou = lo.astype(jnp.uint32)
    lo16a = (lou >> 16).astype(jnp.int32)   # < 2^16
    lo16b = (lou & jnp.uint32(0xFFFF)).astype(jnp.int32)
    s_hi = u64_sum(hi)                      # each hi < 2^30
    s_a = u64_sum(lo16a)
    s_b = u64_sum(lo16b)
    # (sum hi) << 32 : keep only the low 32 bits of s_hi (overflow beyond
    # 2^64 is out of contract anyway)
    t = (s_hi[1], jnp.zeros_like(s_hi[1]))
    t = u64_add(t, u64_shl(s_a, 16))
    t = u64_add(t, s_b)
    return t


def u64_to_py(x: tuple) -> int:
    """Host-side: emulated u64 -> Python int."""
    hi = int(np.uint32(np.asarray(x[0])))
    lo = int(np.uint32(np.asarray(x[1])))
    return (hi << 32) | lo


def u64_leq_const(x: tuple, const: int) -> jax.Array:
    """x <= const for emulated u64 and a Python-int constant < 2**64."""
    chi = np.int32(np.uint32(const >> 32))
    clo = np.int32(np.uint32(const & 0xFFFFFFFF))
    xh = x[0].astype(jnp.uint32)
    xl = x[1].astype(jnp.uint32)
    uhi = jnp.uint32(np.uint32(chi))
    ulo = jnp.uint32(np.uint32(clo))
    return (xh < uhi) | ((xh == uhi) & (xl <= ulo))
