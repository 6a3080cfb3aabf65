"""Fused Pallas kernel: CRS expansion + Ajtai commitment in one pass.

Computes t = A s where A is the *virtual* CRS matrix: each grid block
  1. derives its Threefry counter offsets (emulated-u64, in-register),
  2. PRG-expands its (rows x n x d) tile of A — the CRS never touches HBM,
  3. transforms the tile per CRT prime (int8-limb MXU dots vs the twiddle
     matrix),
  4. contracts with the (resident) transformed witness over n,
  5. inverse-transforms and Garner-reconstructs the result mod q.

One HBM write of the t block per grid step; A itself never exists anywhere.
This is the "PRG-expand + NTT + matmul" fused kernel from SURVEY.md's
native-component checklist (items (c)+(d)); the same pattern covers the u1
outer commitment (B tiles) — roadmap.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import LabradorParams
from .ntt import NttPlan
from .ntt_pallas import _split_np_i8
from . import prg


def _pick_row_block(kappa: int, n: int) -> int:
    """Rows per grid step: keep the A tile (rows*n*d int32 + offsets)
    within a comfortable VMEM slice, and divide kappa evenly."""
    target = max(1, 2048 // max(n, 1))
    blk = 1
    for cand in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024):
        if cand <= target and kappa % cand == 0:
            blk = cand
    return blk


def _make_kernel(params: LabradorParams, plan: NttPlan, r_blk: int):
    p = params
    n, r, d, q = p.n, p.r, p.d, p.q
    primes = plan.primes
    P = len(primes)
    RN = r_blk * n
    stride = r_blk * n * d  # flat CRS offsets per block (A layout: row*n*d)

    def kernel(key_ref, s_ref, vhi_ref, vlo_ref, whi_ref, wlo_ref, out_ref):
        blk = pl.program_id(0)
        # --- block-local 64-bit CRS offsets: blk*stride + iota
        bh, bl = prg.offset_mul_i32(jnp.int32(blk), stride)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (RN, d), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (RN, d), 1)
        flat = row_ids * d + col_ids                    # < 2^31 per block
        off = prg.offset_add((bh, bl),
                             (jnp.zeros((RN, d), jnp.uint32),
                              flat.astype(jnp.uint32)))
        # --- PRG-expand the A tile (counter-mode Threefry, mod q)
        a_tile = prg.uniform_mod_q(key_ref[0, 0], key_ref[0, 1],
                                   off[0], off[1], q)   # (RN, d) int32

        dn = (((1,), (0,)), ((), ()))
        dot = partial(jax.lax.dot_general, dimension_numbers=dn,
                      preferred_element_type=jnp.int32)

        def split8(x):
            lo = ((x + 128) & 255) - 128
            hi = (x - lo) >> 8
            return hi.astype(jnp.int8), lo.astype(jnp.int8)

        def mm_mod(x, m_hi, m_lo, pr):
            x_hi, x_lo = split8(x)
            p11 = dot(x_hi, m_hi)
            p10 = dot(x_hi, m_lo) + dot(x_lo, m_hi)
            p00 = dot(x_lo, m_lo)
            c16 = (1 << 16) % pr
            c8 = (1 << 8) % pr
            return ((p11 % pr) * c16 % pr + (p10 % pr) * c8 % pr
                    + (p00 % pr)) % pr

        residues = []
        for pi in range(P):
            pr = int(primes[pi])
            ap = a_tile % pr
            ahat = mm_mod(ap, vhi_ref[pi], vlo_ref[pi], pr)   # (RN, d)
            ahat3 = ahat.reshape(r_blk, n, d)
            # contract over n against the resident transformed witness
            cols = []
            for j in range(r):
                sj = s_ref[pi, :, j, :]                        # (n, d)
                prod = (ahat3 * sj[None, :, :]) % pr           # < pr
                cols.append(jnp.sum(prod, axis=1) % pr)        # (r_blk, d)
            acc = jnp.stack(cols, axis=1)                      # (r_blk, r, d)
            inv = mm_mod(acc.reshape(r_blk * r, d),
                         whi_ref[pi], wlo_ref[pi], pr)
            residues.append(inv)                               # (r_blk*r, d)

        # --- Garner mixed-radix + signed correction mod q
        v = [residues[0]]
        for k in range(1, P):
            pr = int(primes[k])
            t = (residues[k] - v[0]) % pr
            for j in range(1, k):
                t = (t * int(plan.garner_inv[j - 1, k])) % pr
                t = (t - v[j]) % pr
            t = (t * int(plan.garner_inv[k - 1, k])) % pr
            v.append(t)
        out = jnp.zeros_like(v[0])
        for j in range(P):
            out = out + (v[j] * plan.prefix_mod_q[j]) % q
        gt = jnp.zeros(v[0].shape, jnp.bool_)
        for j in range(P):
            mj = plan.m_half_digits[j]
            gt = (v[j] > mj) | ((v[j] == mj) & gt)
        out = (out - jnp.where(gt, plan.m_mod_q, 0)) % q
        out_ref[:] = out.reshape(r_blk, r, d)

    return kernel


@lru_cache(maxsize=None)
def _build_call(params: LabradorParams, plan: NttPlan):
    p = params
    d = p.d
    P = len(plan.primes)
    r_blk = _pick_row_block(p.kappa, p.n)
    kernel = _make_kernel(params, plan, r_blk)
    grid = (p.kappa // r_blk,)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p.kappa, p.r, d), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((P, p.n, p.r, d), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk, p.r, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * p.kappa * p.n * d * P * (2 * 4 * d + p.r),
            bytes_accessed=p.kappa * p.r * d * 4,
            transcendentals=0,
        ),
    )
    return call, r_blk


def ajtai_commit_pallas(crs_key: jax.Array, s_hat: jax.Array,
                        params: LabradorParams, plan: NttPlan) -> jax.Array:
    """t = A s with the virtual CRS expanded in-kernel.

    crs_key: (2,) uint32; s_hat: (P, r, n, d) transformed witness.
    Returns (r, kappa, d) int32 mod q — identical to protocol.ajtai_commit.
    """
    from .ntt_pallas import _plan_consts
    vhi, vlo, whi, wlo = (jnp.asarray(x) for x in _plan_consts(plan))
    call, _ = _build_call(params, plan)
    key2 = jnp.asarray(crs_key, jnp.uint32).reshape(1, 2)
    s_in = jnp.swapaxes(s_hat, 1, 2)            # (P, n, r, d)
    t = call(key2, s_in, vhi, vlo, whi, wlo)    # (kappa, r, d)
    return jnp.swapaxes(t, 0, 1)                # (r, kappa, d)
