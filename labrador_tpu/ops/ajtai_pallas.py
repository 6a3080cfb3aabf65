"""Fused Pallas kernel: CRS expansion + Ajtai commitment in one pass.

Computes t = A s where A is the *virtual* CRS matrix, as ONE giant int8 MXU
matmul against the negacyclic-circulant matrix of the witness:

    t[row, j, :] = sum_n A[row, n, :] (*) s[j, n, :]          ((*) = Rq mult)
                 = A_flat[row, :] @ C[:, j*d:(j+1)*d]

where A_flat is the (kappa, n*d) coefficient view of A and C is the
(n*d, r*d) stack of negacyclic circulants C[(n,i), (j,k)] =
sign(i,k) * s_c[j, n, (k-i) mod d] over the *centered* witness.  This
replaces the NTT route entirely inside the kernel: no eval-domain pointwise
step (the round-1 kernel ran that contraction per-lane on the VPU and lost
to XLA — PERF.md), no INTT, every FLOP on the MXU.

Grid is (kappa blocks, K blocks): each step PRG-expands its A tile from
Threefry counters (the CRS never touches HBM — SURVEY.md native checklist
(c)+(d)), splits to signed int8 limbs, and accumulates 4 limb matmuls per
CRT prime into VMEM scratch; the last K step folds limbs mod p and writes
per-prime residues.  Garner reconstruction mod q runs as a tiny XLA epilog
(zq.fold_res_modq).

Exactness: A in [0, q), s centered with |s| <= q/2 < 2^12 at reference
moduli; limb products accumulate in int32 (bounds in comments below);
the reconstructed integer |X| <= n*d*q*q/2 << M/2, so the signed Garner
fold is exact.  Reference role: ``proofgen.rs:41-49`` + ``structs.rs:55-72``.
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


def _pick_blocks(kappa: int, nd: int, rd: int, n_primes: int) -> tuple[int, int]:
    """(row block, K block) under the 16 MB scoped-VMEM limit.  Live
    buffers: the circulant block (kc x rd int8, hi+lo), the accumulator
    scratch + output block ((3+1) x P x mb x rd int32), and ~6 live
    (mb, kc) int32 temporaries from the PRG + limb splits."""
    budget = 11 << 20
    kc = nd
    while kc > 4096 or 2 * kc * rd > budget // 2 or nd % kc:
        kc -= 1
        while nd % kc:
            kc -= 1
    mb = 1
    for cand in (8, 16, 32, 64, 128):
        est = (6 * 4 * cand * kc + 2 * kc * rd
               + 4 * n_primes * cand * rd * 4)
        if cand <= kappa and kappa % cand == 0 and est <= budget:
            mb = cand
    return mb, kc


def _split8(x):
    lo = ((x + 128) & 255) - 128
    hi = (x - lo) >> 8
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def circulant_int8(witness: jax.Array, params: LabradorParams):
    """(r, n, d) witness residues -> negacyclic circulant (n*d, r*d) as
    signed int8 (hi, lo) limbs of the centered values."""
    p = params
    s_c = jnp.where(witness > p.q // 2, witness - p.q, witness)
    i = jnp.arange(p.d)[:, None]
    k = jnp.arange(p.d)[None, :]
    idx = (k - i) % p.d
    sign = jnp.where(k >= i, 1, -1).astype(jnp.int32)
    g = s_c[:, :, idx] * sign[None, None]          # (r, n, d_i, d_k)
    cmat = jnp.transpose(g, (1, 2, 0, 3)).reshape(p.n * p.d, p.r * p.d)
    return _split8(cmat)


def _make_kernel(params: LabradorParams, plan: NttPlan,
                 mb: int, kc: int, n_kc: int):
    p = params
    nd, q = p.n * p.d, p.q
    primes = plan.primes
    P = len(primes)

    def kernel(key_ref, chi_ref, clo_ref, out_ref, acc_ref):
        blk = pl.program_id(0)
        kcb = pl.program_id(1)

        # --- A tile offsets: row (blk*mb + r) at column (kcb*kc + c):
        #     flat = (blk*mb + r) * nd + kcb*kc + c   (A layout: row*n*d)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (mb, kc), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (mb, kc), 1)
        base = prg.offset_add(
            prg.offset_mul_i32(blk * mb, nd),
            prg.offset_mul_i32(kcb, kc))
        flat = row_ids * nd + col_ids
        off = prg.offset_add(base, (jnp.zeros((mb, kc), jnp.uint32),
                                    flat.astype(jnp.uint32)))
        a_tile = prg.uniform_mod_q(key_ref[0, 0], key_ref[0, 1],
                                   off[0], off[1], q)      # (mb, kc) [0, q)

        @pl.when(kcb == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dn = (((1,), (0,)), ((), ()))

        def dot(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=jnp.int32)

        c_hi = chi_ref[:]
        c_lo = clo_ref[:]
        for pi in range(P):
            pr = int(primes[pi])
            ap = a_tile % pr                                # [0, pr)
            a_hi, a_lo = _split8(ap)   # a_hi <= 126, |a_lo| <= 128
            # per-chunk bounds (kc <= 8192): p11 <= kc*126*16 ~ 1.7e7,
            # p10 <= kc*(126*128 + 128*16) ~ 1.5e8, p00 <= kc*128*128
            # ~ 1.3e8; accumulated over n_kc chunks still < 2^31 for
            # nd <= 2^17.
            acc_ref[pi, 0] += dot(a_hi, c_hi)
            acc_ref[pi, 1] += dot(a_hi, c_lo) + dot(a_lo, c_hi)
            acc_ref[pi, 2] += dot(a_lo, c_lo)

        @pl.when(kcb == n_kc - 1)
        def _():
            for pi in range(P):
                pr = int(primes[pi])
                c16 = (1 << 16) % pr
                c8 = (1 << 8) % pr
                res = ((acc_ref[pi, 0] % pr) * c16 % pr
                       + (acc_ref[pi, 1] % pr) * c8 % pr
                       + acc_ref[pi, 2] % pr) % pr
                out_ref[pi] = res

    return kernel


@lru_cache(maxsize=None)
def _build_call(params: LabradorParams, plan: NttPlan):
    p = params
    nd, rd = p.n * p.d, p.r * p.d
    P = len(plan.primes)
    mb, kc = _pick_blocks(p.kappa, nd, rd, P)
    n_kc = nd // kc
    kernel = _make_kernel(params, plan, mb, kc, n_kc)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, p.kappa, rd), jnp.int32),
        grid=(p.kappa // mb, n_kc),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, kcb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kc, rd), lambda i, kcb: (kcb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, rd), lambda i, kcb: (kcb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, mb, rd), lambda i, kcb: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, 3, mb, rd), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * P * p.kappa * nd * rd,
            bytes_accessed=p.kappa * rd * P * 4 + nd * rd * 2,
            transcendentals=0,
        ),
    )
    return call, mb


def ajtai_commit_pallas(crs_key: jax.Array, witness: jax.Array,
                        params: LabradorParams, plan: NttPlan) -> jax.Array:
    """t = A s with the virtual CRS expanded in-kernel and the contraction
    on the MXU (circulant matmul — see module docstring).

    crs_key: (2,) uint32; witness: (r, n, d) residues in [0, q).
    Returns (r, kappa, d) int32 mod q — identical to protocol.ajtai_commit.
    """
    p = params
    assert not zq_ops.is_big(p.q), "fused Ajtai kernel is single-limb only"
    # raw int32 limb accumulation across K chunks: |p00| <= n*d * 128 * 128
    assert p.n * p.d <= 1 << 16, "n*d beyond raw-int32 limb accumulation"
    c_hi, c_lo = circulant_int8(witness, p)
    call, _ = _build_call(p, plan)
    key2 = jnp.asarray(crs_key, jnp.uint32).reshape(1, 2)
    res = call(key2, c_hi, c_lo)                  # (P, kappa, r*d)
    t = zq_ops.fold_res_modq(res, plan, signed=True)
    t = t.reshape(p.kappa, p.r, p.d)
    return jnp.swapaxes(t, 0, 1)                  # (r, kappa, d)
