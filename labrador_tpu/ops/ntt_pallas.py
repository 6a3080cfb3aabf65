"""Fused Pallas TPU kernel: negacyclic polymul (NTT -> pointwise -> INTT ->
Garner) in one VMEM-resident pass.

The XLA path (ops/ntt.py) materializes each stage to HBM between the
twiddle matmuls and the mod-arithmetic chains.  This kernel keeps a block
of polynomials in VMEM through the whole pipeline: per CRT prime, two int8
limb-matmul transforms (MXU), the pointwise product, the inverse transform,
then the cross-prime Garner reconstruction mod q — one HBM read per input
block and one write of the final result.

Twiddle matrices ship pre-split into int8 limbs (hi*256 + lo with centered
lo), so in-kernel the transforms are exactly 4 int8 dots each, matching the
modmath.modmul_mm decomposition bit-for-bit.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import NttPlan
from .modmath import P_MAX, mod_pos, mod_pos_small

BLOCK = 1024  # polynomials per grid step; VMEM ~ BLOCK*64*4B*(#temps)


def _split_np_i8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lo = ((x + 128) % 256) - 128
    hi = (x - lo) >> 8
    return hi.astype(np.int8), lo.astype(np.int8)


@lru_cache(maxsize=None)
def _plan_consts(plan: NttPlan):
    """Static per-plan constants: int8-limb twiddles (host numpy — NEVER
    cache jnp arrays here: a first call inside a jit trace would cache
    tracers and leak them into later traces)."""
    V_hi, V_lo = _split_np_i8(plan.V)
    W_hi, W_lo = _split_np_i8(plan.W)
    return V_hi, V_lo, W_hi, W_lo


def _mm_mod(x_hi, x_lo, m_hi, m_lo, p: int):
    """(x_hi*256+x_lo) @ (m_hi*256+m_lo) mod p via 4 int8 MXU dots —
    in-kernel mirror of modmath.modmul_mm.  All reductions go through
    mod_pos's float-Barrett fast path: integer `%` has no hardware divide
    on the TPU VPU and dominated the kernel (2.2x — bench_logs/diag_mod)."""
    dn = (((1,), (0,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dn,
                  preferred_element_type=jnp.int32)
    p11 = dot(x_hi, m_hi)
    p10 = dot(x_hi, m_lo) + dot(x_lo, m_hi)
    p00 = dot(x_lo, m_lo)
    # d=64 contraction: |p10| < 2^21, one-step reductions are exact and
    # centered limb weights keep the recombination in int32 — one final
    # full reduction (see modmath.modmul_mm_p's short-contraction branch)
    c16c = (1 << 16) % p - (p if ((1 << 16) % p) > p // 2 else 0)
    c8c = (1 << 8) % p - (p if ((1 << 8) % p) > p // 2 else 0)
    pv = np.array([p])
    r = mod_pos_small(p11, pv) * c16c + mod_pos_small(p10, pv) * c8c + p00
    return mod_pos(r, p)


def _split_i8_arr(x):
    lo = ((x + 128) & 255) - 128
    hi = (x - lo) >> 8
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _make_kernel(plan: NttPlan):
    primes = plan.primes
    P = len(primes)
    q = plan.q

    def kernel(a_ref, b_ref, vhi_ref, vlo_ref, whi_ref, wlo_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]
        residues = []
        for pi in range(P):
            p = int(primes[pi])
            ap = mod_pos(a, p)
            bp = mod_pos(b, p)
            a_hi, a_lo = _split_i8_arr(ap)
            b_hi, b_lo = _split_i8_arr(bp)
            ahat = _mm_mod(a_hi, a_lo, vhi_ref[pi], vlo_ref[pi], p)
            bhat = _mm_mod(b_hi, b_lo, vhi_ref[pi], vlo_ref[pi], p)
            prod = mod_pos(ahat * bhat, p)
            pr_hi, pr_lo = _split_i8_arr(prod)
            residues.append(_mm_mod(pr_hi, pr_lo, whi_ref[pi], wlo_ref[pi], p))

        # Garner mixed-radix digits (constants static)
        v = [residues[0]]
        for k in range(1, P):
            p = int(primes[k])
            t = mod_pos(residues[k] - v[0], p)
            for j in range(1, k):
                t = mod_pos(t * int(plan.garner_inv[j - 1, k]), p)
                t = mod_pos(t - v[j], p)
            t = mod_pos(t * int(plan.garner_inv[k - 1, k]), p)
            v.append(t)
        out = jnp.zeros_like(v[0])
        for j in range(P):
            out = out + mod_pos(v[j] * plan.prefix_mod_q[j], q)
        gt = jnp.zeros(v[0].shape, jnp.bool_)
        for j in range(P):
            mj = plan.m_half_digits[j]
            gt = (v[j] > mj) | ((v[j] == mj) & gt)
        out = out - jnp.where(gt, plan.m_mod_q, 0)
        out_ref[:] = mod_pos(out, q)

    return kernel


@lru_cache(maxsize=None)
def _build_call(plan: NttPlan, n_rows: int):
    d = plan.d
    P = len(plan.primes)
    kernel = _make_kernel(plan)
    grid = (n_rows // BLOCK,) if n_rows % BLOCK == 0 and n_rows >= BLOCK \
        else (1,)
    blk = BLOCK if grid[0] > 1 or n_rows == BLOCK else n_rows

    def row_spec():
        return pl.BlockSpec((blk, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec():
        return pl.BlockSpec((P, d, d), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.int32),
        grid=grid,
        in_specs=[row_spec(), row_spec(),
                  const_spec(), const_spec(), const_spec(), const_spec()],
        out_specs=row_spec(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * d * d * 3 * P * 4,
            bytes_accessed=3 * n_rows * d * 4,
            transcendentals=0,
        ),
    )


def negacyclic_polymul_pallas(a: jax.Array, b: jax.Array,
                              plan: NttPlan) -> jax.Array:
    """Exact (a * b) in Rq for (..., d) int32 tensors — fused VMEM pipeline.
    Semantically identical to ops.ntt.negacyclic_polymul."""
    assert plan.q <= P_MAX
    shape = a.shape
    a2 = a.reshape(-1, plan.d)
    b2 = jnp.broadcast_to(b, shape).reshape(-1, plan.d)
    n = a2.shape[0]
    pad = (-n) % BLOCK if n > BLOCK else 0
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((pad, plan.d), jnp.int32)])
        b2 = jnp.concatenate([b2, jnp.zeros((pad, plan.d), jnp.int32)])
    vhi, vlo, whi, wlo = (jnp.asarray(x) for x in _plan_consts(plan))
    out = _build_call(plan, a2.shape[0])(a2, b2, vhi, vlo, whi, wlo)
    if pad:
        out = out[:n]
    return out.reshape(shape)
