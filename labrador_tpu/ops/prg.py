"""Counter-mode PRG for on-device CRS expansion.

The reference's CRS is a *lazy random oracle*: every coefficient re-keys a
fresh ChaCha20Rng from ``base_seed + offset`` and draws one value
(``structs.rs:147-171``) — deterministic but serial and absurdly expensive.
The TPU-native equivalent keeps the same logical indexing
(coefficient value = f(base_seed, global_offset)) but uses a counter-based
Threefry-2x32 block so any tile of coefficients is generated in parallel,
on device, with no stream state.

Threefry-2x32 (Salmon et al., SC'11) is implemented here directly in jnp
uint32 ops — bit-identical on CPU and TPU backends (unlike pltpu.prng_*),
and liftable into Pallas kernels unchanged.

Draws are uniform mod q by reducing a 64-bit sample: bias < q / 2^64,
cryptographically negligible (the reference's rejection sampling is unbiased
but its per-coefficient re-key dominates any such nicety).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .modmath import mod_pos

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def threefry2x32(k0, k1, c0, c1):
    """One Threefry-2x32 block: keys (k0,k1), counter (c0,c1) -> (x0,x1).

    All args uint32 arrays (broadcastable); 20 rounds (standard).
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    ks2 = k0 ^ k1 ^ _PARITY
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1

    def four_rounds(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        return x0, x1

    x0, x1 = four_rounds(x0, x1, _ROT_A)
    x0, x1 = x0 + k1, x1 + ks2 + jnp.uint32(1)
    x0, x1 = four_rounds(x0, x1, _ROT_B)
    x0, x1 = x0 + ks2, x1 + k0 + jnp.uint32(2)
    x0, x1 = four_rounds(x0, x1, _ROT_A)
    x0, x1 = x0 + k0, x1 + k1 + jnp.uint32(3)
    x0, x1 = four_rounds(x0, x1, _ROT_B)
    x0, x1 = x0 + k1, x1 + ks2 + jnp.uint32(4)
    x0, x1 = four_rounds(x0, x1, _ROT_A)
    x0, x1 = x0 + ks2, x1 + k0 + jnp.uint32(5)
    return x0, x1


def uniform_mod_q(k0, k1, off_hi, off_lo, q: int):
    """Uniform-ish draw in [0, q) from a 64-bit counter: reduce the 64-bit
    Threefry output mod q (bias < q/2^64).

    Small q (< 2^15): int32 result via 16-bit-half folding.  Big q
    (2^32 < q < 2^33): two-limb ``zq.Zq2`` result via the emulated-u64
    Barrett reduction (ops/bigq.py) — same counter layout, so the CRS
    offset scheme is modulus-independent.
    """
    x0, x1 = threefry2x32(k0, k1, off_hi, off_lo)
    from .modmath import P_MAX
    if q > P_MAX:
        from .bigq import _u64_mod_q
        from .zq import from_words32
        rh, rl = _u64_mod_q((x0.astype(jnp.int32), x1.astype(jnp.int32)), q)
        return from_words32(rh, rl)
    c32 = (1 << 32) % q
    # uint32 -> mod q without int64: split into 16-bit halves
    def u32_mod_q(u):
        hi = (u >> 16).astype(jnp.int32)
        lo = (u & jnp.uint32(0xFFFF)).astype(jnp.int32)
        return mod_pos(mod_pos(hi * ((1 << 16) % q), q) + lo, q)

    r0 = u32_mod_q(x0)
    r1 = u32_mod_q(x1)
    return mod_pos(mod_pos(r0 * c32, q) + r1, q)


def uniform_bits(k0, k1, off_hi, off_lo) -> tuple[jax.Array, jax.Array]:
    """Raw 64 bits for non-modular sampling (signs, ternary draws)."""
    return threefry2x32(k0, k1, off_hi, off_lo)


# ---------------------------------------------------------------------------
# 64-bit offset helpers (no int64 on TPU: offsets are (hi, lo) uint32 pairs)
# ---------------------------------------------------------------------------

def offset_const(v: int):
    """Python int -> (hi, lo) uint32 scalars."""
    return jnp.uint32((v >> 32) & 0xFFFFFFFF), jnp.uint32(v & 0xFFFFFFFF)


def offset_add(a, b):
    """(hi,lo) + (hi,lo) with carry, uint32 arrays."""
    ah, al = a
    bh, bl = b
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def offset_mul_i32(idx, mult: int):
    """(traced nonneg int32 idx) * (python const mult < 2^31) -> (hi, lo)."""
    from .modmath import mul32x32_u64
    hi, lo = mul32x32_u64(jnp.asarray(idx, jnp.int32),
                          jnp.full_like(jnp.asarray(idx, jnp.int32), mult))
    return hi.astype(jnp.uint32), lo.astype(jnp.uint32)


def offset_iota(start, count: int):
    """start (hi,lo scalars) + [0..count) -> (hi, lo) arrays of shape (count,)."""
    sh, sl = start
    i = jnp.arange(count, dtype=jnp.uint32)
    lo = sl + i
    carry = (lo < sl).astype(jnp.uint32)
    return sh + carry, lo
