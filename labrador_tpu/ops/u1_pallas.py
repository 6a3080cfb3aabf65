"""Fused Pallas kernel for the u1 outer commitment's B-term.

u1's dominant cost is  sum_{m, col} B_m[row, col] (*) t_m[col]  over the
m = r * t_1 virtual B matrices (``proofgen.rs:100-132``) — in the XLA path
every PRG-expanded B tile round-trips HBM between expansion and the
transform matmul.  Here, like ops/ajtai_pallas, the whole term is one int8
MXU matmul  (kappa_1, K) @ (K, d)  with K = m * kappa * d, against the
negacyclic circulant of the t-digit stream:

  * B tiles are PRG-expanded from Threefry counters in VMEM (never HBM),
  * digits are tiny (|dig| <= b_1 // 2 <= 127 at reference moduli), so the
    circulant side is a SINGLE int8 limb — 2 limb-dots per prime,
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
from . import prg
from . import zq as zq_ops
from .ajtai_pallas import _split8


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


def circulant_digits_int8(t_dig: jax.Array, params: LabradorParams,
                          kc: int) -> jax.Array:
    """(t1, r, kappa, d) digit residues -> blocked negacyclic circulant
    (n_steps, kc, d) int8 of the centered digits, in the B-matrix K order
    (m = i * t_1 + k, then col, then coeff)."""
    p = params
    half = p.b_1 // 2
    assert half <= 127, "digit magnitude beyond single int8 limb"
    dig_c = jnp.where(t_dig > p.q // 2, t_dig - p.q, t_dig)
    stream = jnp.swapaxes(dig_c, 0, 1).reshape(-1, p.d)   # (m*kappa, d)
    i = jnp.arange(p.d)[:, None]
    k = jnp.arange(p.d)[None, :]
    idx = (k - i) % p.d
    sign = jnp.where(k >= i, 1, -1).astype(jnp.int32)
    circ = stream[:, idx] * sign[None]                    # (mk, d_i, d_k)
    circ = circ.reshape(-1, p.d)                          # (m*kappa*d, d)
    return circ.astype(jnp.int8).reshape(-1, kc, p.d)     # (steps, kc, d)


def _make_kernel(params: LabradorParams, plan: NttPlan,
                 mb: int, kc: int, n_cb: int):
    p = params
    kd = p.kappa * p.d
    size_b = p.kappa_1 * p.kappa                          # structs.rs:81
    primes = plan.primes
    P = len(primes)

    def kernel(key_ref, circ_ref, out_ref, acc_ref):
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
        b_tile = prg.uniform_mod_q(key_ref[0, 0], key_ref[0, 1],
                                   off[0], off[1], p.q)   # (mb, kc)

        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dn = (((1,), (0,)), ((), ()))

        def dot(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=jnp.int32)

        c_blk = circ_ref[0]
        for pi in range(P):
            pr = int(primes[pi])
            bp = b_tile % pr
            b_hi, b_lo = _split8(bp)
            # chunk contribution reduced mod p each step: the full-K raw
            # sum would overflow int32 (K = m*kappa*d can reach 2^21+).
            c8 = (1 << 8) % pr
            contrib = ((dot(b_hi, c_blk) % pr) * c8 % pr
                       + dot(b_lo, c_blk) % pr) % pr
            acc_ref[pi] = (acc_ref[pi] + contrib) % pr

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
    kernel = _make_kernel(p, plan, mb, kc, n_cb)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p.kappa_1 // mb, P, mb, p.d),
                                       jnp.int32),
        grid=(p.kappa_1 // mb, n_steps),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, kc, p.d), lambda i, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, mb, p.d), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, mb, p.d), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * P * p.kappa_1 * m_total * kd * p.d,
            bytes_accessed=p.kappa_1 * p.d * P * 4
            + m_total * kd * p.d * (p.kappa_1 // mb),
            transcendentals=0,
        ),
    )
    return call, mb, kc


def u1_bterm_pallas(crs_key: jax.Array, t_dig: jax.Array,
                    params: LabradorParams, plan: NttPlan) -> jax.Array:
    """sum_{m,col} B_m[row,col] * t_m[col] -> (kappa_1, d) mod q, with the
    B matrices PRG-expanded in-kernel and the contraction on the MXU.
    Bit-identical to the XLA B-term of protocol.u1_from_digits."""
    p = params
    assert not zq_ops.is_big(p.q), "fused u1 kernel is single-limb only"
    call, mb, kc = _build_call(p, plan)
    # circulant side of the kernel's (1, kc, d) blocks: the circ_ref block
    # index map walks the (m, col-block) step axis
    circ = circulant_digits_int8(t_dig, p, kc)
    key2 = jnp.asarray(crs_key, jnp.uint32).reshape(1, 2)
    res = call(key2, circ)                        # (blocks, P, mb, d)
    res = jnp.moveaxis(res, 1, 0).reshape(len(plan.primes), p.kappa_1, p.d)
    return zq_ops.fold_res_modq(res, plan, signed=True)
