"""Fused Pallas kernel for the u1 outer commitment's B-term.

u1's dominant cost is  sum_{m, col} B_m[row, col] (*) t_m[col]  over the
m = r * t_1 virtual B matrices (``proofgen.rs:100-132``) — in the XLA path
every PRG-expanded B tile round-trips HBM between expansion and the
transform matmul.  Here, like ops/ajtai_pallas, the whole term is one int8
MXU matmul  (kappa_1, K) @ (K, d)  with K = m * kappa * d, against the
negacyclic circulant of the t-digit stream:

  * B tiles are PRG-expanded from Threefry counters in VMEM (never HBM);
    at big q (2^32-scale) the emulated-u64 Barrett reduction runs in-kernel
    on the raw Threefry words,
  * digits are small (|dig| <= b_1 // 2), so the circulant side is 1-2
    signed int8 limbs (1 at reference moduli),
  * per grid step the chunk contribution is reduced mod p and added to a
    running residue accumulator (the full-K raw sum would overflow int32),
  * Garner reconstruction mod q and the (small) C-term run as XLA epilogs.

Offset layout per the CRS quirks (structs.rs:74-88): B_m starts at
off_b + m * kappa_1 * kappa (no *d in the stride) with row stride kappa*d.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import LabradorParams
from .ntt import NttPlan
from .modmath import mod_pos
from . import prg
from . import zq as zq_ops
from .ajtai_pallas import _split8, _split_limbs8, _words_mod_p, digit_limbs


def _pick_blocks(kappa_1: int, kd: int) -> tuple[int, int]:
    """(row block, K block): same VMEM reasoning as ajtai_pallas."""
    kc = kd
    while kc > 4096 or kd % kc:
        kc -= 1
        while kd % kc:
            kc -= 1
    mb = 1
    for cand in (8, 16, 32, 64, 128):
        if cand <= kappa_1 and kappa_1 % cand == 0 and cand * kc <= (1 << 18):
            mb = cand
    return mb, kc


def circulant_digit_limbs(dig_stream: jax.Array, params: LabradorParams,
                          kc: int, n_limbs: int) -> list[jax.Array]:
    """(N, d) centered digit values (int32) -> blocked negacyclic circulant
    limbs, each (n_steps, kc, d) int8, little-endian weight 2^(8w)."""
    p = params
    circ_i = jnp.arange(p.d)[:, None]
    circ_k = jnp.arange(p.d)[None, :]
    idx = (circ_k - circ_i) % p.d
    sign = jnp.where(circ_k >= circ_i, 1, -1).astype(jnp.int32)
    circ = dig_stream[:, idx] * sign[None]                # (N, d_i, d_k)
    circ = circ.reshape(-1, p.d)                          # (N*d, d)
    return [l.reshape(-1, kc, p.d) for l in _split_limbs8(circ, n_limbs)]


def _center_digits(dig, params: LabradorParams) -> jax.Array:
    """Digit tensors -> centered int32 values: big-q digits are already
    signed int32; small-q digits are residues mod q."""
    if zq_ops.is_big(params.q):
        return jnp.asarray(dig, jnp.int32)
    return jnp.where(dig > params.q // 2, dig - params.q, dig)


def _make_kernel(params: LabradorParams, plan: NttPlan,
                 mb: int, kc: int, n_cb: int, n_limbs: int):
    p = params
    kd = p.kappa * p.d
    size_b = p.kappa_1 * p.kappa                          # structs.rs:81
    primes = plan.primes
    P = len(primes)
    big = zq_ops.is_big(p.q)

    def kernel(key_ref, *refs):
        c_refs = refs[:n_limbs]
        out_ref, acc_ref = refs[n_limbs], refs[n_limbs + 1]
        blk = pl.program_id(0)
        s = pl.program_id(1)
        m = s // n_cb
        cb = s % n_cb

        # offsets: off_b + m*size_b + (blk*mb + row)*kd + cb*kc + c
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (mb, kc), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (mb, kc), 1)
        base = prg.offset_add(prg.offset_const(p.kappa * p.n * p.d),
                              prg.offset_mul_i32(m, size_b))
        base = prg.offset_add(base, prg.offset_mul_i32(blk * mb, kd))
        base = prg.offset_add(base, prg.offset_mul_i32(cb, kc))
        flat = row_ids * kd + col_ids
        off = prg.offset_add(base, (jnp.zeros((mb, kc), jnp.uint32),
                                    flat.astype(jnp.uint32)))
        if big:
            from .bigq import _u64_mod_q
            x0, x1 = prg.threefry2x32(key_ref[0, 0], key_ref[0, 1],
                                      off[0], off[1])
            b_rh, b_rl = _u64_mod_q((x0.astype(jnp.int32),
                                     x1.astype(jnp.int32)), p.q)
        else:
            b_tile = prg.uniform_mod_q(key_ref[0, 0], key_ref[0, 1],
                                       off[0], off[1], p.q)   # (mb, kc)

        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dn = (((1,), (0,)), ((), ()))

        def dot(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=jnp.int32)

        for pi in range(P):
            pr = int(primes[pi])
            if big:
                bp = _words_mod_p(b_rh, b_rl, pr)
            else:
                bp = mod_pos(b_tile, pr)
            b_hi, b_lo = _split8(bp)
            b_limb = {0: b_lo, 1: b_hi}
            # chunk contribution reduced mod p each step: the full-K raw
            # sum would overflow int32 (K = m*kappa*d can reach 2^21+).
            # weight-w partials: <= 2 dots each |.| <= kc*2^14 < 2^27;
            # (partial % pr) * cw % pr < 2^15, summed over <= n_limbs+1
            # weights stays far inside int32.
            contrib = jnp.zeros((mb, p.d), jnp.int32)
            for w in range(n_limbs + 1):
                terms = [dot(b_limb[lb], c_refs[w - lb][0])
                         for lb in (0, 1) if 0 <= w - lb < n_limbs]
                cw = (1 << (8 * w)) % pr
                contrib = contrib + mod_pos(mod_pos(sum(terms), pr) * cw, pr)
            acc_ref[pi] = mod_pos(acc_ref[pi] + contrib, pr)

        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc_ref[:]

    return kernel


@lru_cache(maxsize=None)
def _build_call(params: LabradorParams, plan: NttPlan):
    p = params
    kd = p.kappa * p.d
    P = len(plan.primes)
    mb, kc = _pick_blocks(p.kappa_1, kd)
    m_total = p.r * p.t_1
    n_cb = kd // kc
    n_steps = m_total * n_cb
    n_limbs = digit_limbs(p.b_1)
    kernel = _make_kernel(p, plan, mb, kc, n_cb, n_limbs)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p.kappa_1 // mb, P, mb, p.d),
                                       jnp.int32),
        grid=(p.kappa_1 // mb, n_steps),
        in_specs=[pl.BlockSpec((1, 2), lambda i, s: (0, 0),
                               memory_space=pltpu.SMEM)] + [
            pl.BlockSpec((1, kc, p.d), lambda i, s: (s, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_limbs)],
        out_specs=pl.BlockSpec((1, P, mb, p.d), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, mb, p.d), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (n_limbs + 1) * P * p.kappa_1 * m_total * kd * p.d,
            bytes_accessed=p.kappa_1 * p.d * P * 4
            + m_total * kd * p.d * n_limbs * (p.kappa_1 // mb),
            transcendentals=0,
        ),
    )
    return call, mb, kc, n_limbs


def u1_bterm_pallas(crs_key: jax.Array, t_dig: jax.Array,
                    params: LabradorParams, plan: NttPlan):
    """sum_{m,col} B_m[row,col] * t_m[col] -> (kappa_1, d) mod q, with the
    B matrices PRG-expanded in-kernel and the contraction on the MXU.
    Bit-identical to the XLA B-term of protocol.u1_from_digits.

    t_dig: (t_1, r, kappa, d) digits — residues mod q at small q, signed
    int32 at big q (the protocol digit conventions)."""
    p = params
    call, mb, kc, n_limbs = _build_call(p, plan)
    # circulant side of the kernel's (1, kc, d) blocks: the circ_ref block
    # index map walks the (m, col-block) step axis in B-matrix K order
    # (m = i * t_1 + k, then col, then coeff)
    dig_c = _center_digits(t_dig, p)
    stream = jnp.swapaxes(dig_c, 0, 1).reshape(-1, p.d)   # (m*kappa, d)
    circ = circulant_digit_limbs(stream, p, kc, n_limbs)
    key2 = jnp.asarray(crs_key, jnp.uint32).reshape(1, 2)
    res = call(key2, *circ)                       # (blocks, P, mb, d)
    res = jnp.moveaxis(res, 1, 0).reshape(len(plan.primes), p.kappa_1, p.d)
    return zq_ops.fold_res_modq(res, plan, signed=True)
