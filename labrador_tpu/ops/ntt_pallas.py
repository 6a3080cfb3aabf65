"""Fused Pallas TPU kernel: negacyclic polymul (NTT -> pointwise -> INTT ->
Garner) in one VMEM-resident pass.

The XLA path (ops/ntt.py) materializes each stage to HBM between the
twiddle matmuls and the mod-arithmetic chains.  This kernel keeps a block
of polynomials in VMEM through the whole pipeline: per CRT prime, one
PACKED 128x128 int8 transform dot (MXU), the pointwise product, the packed
inverse transform, then the cross-prime Garner reconstruction mod q — one
HBM read per input block and one write of the final result.

Packed limb scheme (round 5, mirrors modmath.modmul_mm_p): with
C = (256*M) mod p for a twiddle matrix M,

    x @ M = (256*x_hi + x_lo) @ M = x_hi @ C + x_lo @ M      (mod p)
    [x_hi | x_lo] @ [[C_hi | C_lo], [M_hi | M_lo]] = [P1 | P0]
    x @ M = 256*P1 + P0                                      (mod p)

so each d=64 transform is ONE native 128x128 int8 MXU tile (the 4 64-wide
limb dots of rounds 1-4 packed with zero wasted MACs) followed by a single
shift-add + one two-step Barrett (|256*P1 + P0| <= 64*8290561 < 2^31-2^20,
the tier-1 bound in modmath).  The per-prime twiddles ship pre-packed as
(P, 128, 128) int8 constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import NttPlan
from .modmath import P_MAX, mod_pos

BLOCK = 1024  # polynomials per grid step; VMEM ~ BLOCK*64*4B*(#temps)


def _split_np_i8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lo = ((x + 128) % 256) - 128
    hi = (x - lo) >> 8
    return hi.astype(np.int8), lo.astype(np.int8)


def _pack_np(M: np.ndarray, p: int) -> np.ndarray:
    """(d, d) int twiddle matrix -> (2d, 2d) packed int8 weight:
    [[C_hi | C_lo], [M_hi | M_lo]] with C = (256*M) mod p."""
    C = (M.astype(np.int64) * 256) % p
    c_hi, c_lo = _split_np_i8(C)
    m_hi, m_lo = _split_np_i8(M.astype(np.int64))
    top = np.concatenate([c_hi, c_lo], axis=1)
    bot = np.concatenate([m_hi, m_lo], axis=1)
    return np.concatenate([top, bot], axis=0)


@lru_cache(maxsize=None)
def _plan_consts(plan: NttPlan):
    """Static per-plan packed twiddles (host numpy — NEVER cache jnp arrays
    here: a first call inside a jit trace would cache tracers and leak them
    into later traces)."""
    P = len(plan.primes)
    Wf = np.stack([_pack_np(plan.V[i], int(plan.primes[i]))
                   for i in range(P)])
    Wi = np.stack([_pack_np(plan.W[i], int(plan.primes[i]))
                   for i in range(P)])
    return Wf, Wi


def _split_i8_arr(x):
    lo = ((x + 128) & 255) - 128
    hi = (x - lo) >> 8
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _limbs2(x):
    """(B, d) int32 in [0, P_MAX) -> (B, 2d) int8 [hi | lo]."""
    hi, lo = _split_i8_arr(x)
    return jnp.concatenate([hi, lo], axis=1)


def _packed_mm(x2, w, p: int, d: int):
    """[x_hi | x_lo] (B, 2d) int8 @ packed weight (2d, 2d) int8
    -> (B, d) int32 in [0, p).  One MXU tile + one shift-add + one
    two-step Barrett (exact: tier-1 bound, d = 64 <= 256)."""
    dd = jax.lax.dot_general(x2, w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return mod_pos((dd[:, :d] << 8) + dd[:, d:], p)


def _garner_out(residues, plan: NttPlan):
    """Cross-prime Garner mixed-radix reconstruction -> [0, q) (static
    constants; signed centering via the M/2 digit comparison)."""
    P = len(plan.primes)
    q = plan.q
    v = [residues[0]]
    for k in range(1, P):
        p = int(plan.primes[k])
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
    return mod_pos(out, q)


def _make_kernel(plan: NttPlan):
    """Pairwise kernel: both operands in coefficient form."""
    primes = plan.primes
    P = len(primes)
    d = plan.d
    shared = plan.q <= min(int(p) for p in primes)  # residues == inputs

    def kernel(a_ref, b_ref, wf_ref, wi_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]
        if shared:
            a2s = _limbs2(a)
            b2s = _limbs2(b)
        residues = []
        for pi in range(P):
            p = int(primes[pi])
            a2 = a2s if shared else _limbs2(mod_pos(a, p))
            b2 = b2s if shared else _limbs2(mod_pos(b, p))
            ahat = _packed_mm(a2, wf_ref[pi], p, d)
            bhat = _packed_mm(b2, wf_ref[pi], p, d)
            prod = mod_pos(ahat * bhat, p)
            residues.append(_packed_mm(_limbs2(prod), wi_ref[pi], p, d))
        out_ref[:] = _garner_out(residues, plan)

    return kernel


def _make_kernel_bhat(plan: NttPlan):
    """Hoisted-operand kernel: b arrives pre-transformed (P, B, d) — the
    shape XLA reaches by hoisting the loop-invariant forward transform of a
    constant operand out of a scan."""
    primes = plan.primes
    P = len(primes)
    d = plan.d
    shared = plan.q <= min(int(p) for p in primes)

    def kernel(a_ref, bhat_ref, wf_ref, wi_ref, out_ref):
        a = a_ref[:]
        if shared:
            a2s = _limbs2(a)
        residues = []
        for pi in range(P):
            p = int(primes[pi])
            a2 = a2s if shared else _limbs2(mod_pos(a, p))
            ahat = _packed_mm(a2, wf_ref[pi], p, d)
            prod = mod_pos(ahat * bhat_ref[pi], p)
            residues.append(_packed_mm(_limbs2(prod), wi_ref[pi], p, d))
        out_ref[:] = _garner_out(residues, plan)

    return kernel


@lru_cache(maxsize=None)
def _build_call(plan: NttPlan, n_rows: int, hoisted: bool):
    d = plan.d
    P = len(plan.primes)
    kernel = (_make_kernel_bhat if hoisted else _make_kernel)(plan)
    grid = (n_rows // BLOCK,) if n_rows % BLOCK == 0 and n_rows >= BLOCK \
        else (1,)
    blk = BLOCK if grid[0] > 1 or n_rows == BLOCK else n_rows

    def row_spec():
        return pl.BlockSpec((blk, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def bhat_spec():
        return pl.BlockSpec((P, blk, d), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec():
        return pl.BlockSpec((P, 2 * d, 2 * d), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), jnp.int32),
        grid=grid,
        in_specs=[row_spec(), bhat_spec() if hoisted else row_spec(),
                  const_spec(), const_spec()],
        out_specs=row_spec(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * (2 * d) * (2 * d) * P * (2 if hoisted else 3),
            bytes_accessed=(3 + (P if hoisted else 1)) * n_rows * d * 4,
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
    wf, wi = (jnp.asarray(x) for x in _plan_consts(plan))
    out = _build_call(plan, a2.shape[0], False)(a2, b2, wf, wi)
    if pad:
        out = out[:n]
    return out.reshape(shape)


def negacyclic_polymul_pallas_bhat(a: jax.Array, bhat: jax.Array,
                                   plan: NttPlan) -> jax.Array:
    """Fused polymul against a PRE-TRANSFORMED operand bhat (P, ..., d) —
    the serving shape where one operand is fixed across many products (its
    forward transform is paid once, exactly as XLA hoists it on the
    unfused path).  Semantically identical to
    ``ntt.ntt_inv_modq(ntt.eval_mul(ntt.ntt_fwd(a), bhat))``."""
    assert plan.q <= P_MAX
    shape = a.shape
    P = plan.n_primes
    a2 = a.reshape(-1, plan.d)
    bh = jnp.broadcast_to(bhat, (P,) + shape).reshape(P, -1, plan.d)
    n = a2.shape[0]
    pad = (-n) % BLOCK if n > BLOCK else 0
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((pad, plan.d), jnp.int32)])
        bh = jnp.concatenate(
            [bh, jnp.zeros((P, pad, plan.d), jnp.int32)], axis=1)
    wf, wi = (jnp.asarray(x) for x in _plan_consts(plan))
    out = _build_call(plan, a2.shape[0], True)(a2, bh, wf, wi)
    if pad:
        out = out[:n]
    return out.reshape(shape)
