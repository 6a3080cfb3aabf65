"""Fused Pallas TPU kernel: negacyclic polymul (NTT -> pointwise -> INTT ->
Garner) in one VMEM-resident pass.

The XLA path (ops/ntt.py) materializes each stage to HBM between the
twiddle matmuls and the mod-arithmetic chains.  This kernel keeps a block
of polynomials in VMEM through the whole pipeline: per CRT prime, one
PACKED int8 transform dot (MXU), the pointwise product, the packed inverse
transform, then the cross-prime Garner reconstruction mod q — one HBM read
per input block and one write of the final result.

Two layout tricks make the kernel VPU-efficient (round 5; the kernel is
VPU-bound — the MXU is < 5% occupied at the measured rates):

1. **Packed limb dots** (mirrors modmath.modmul_mm_p): with
   C = (256*M) mod p for a twiddle matrix M,
       x @ M = x_hi @ C + x_lo @ M                    (mod p)
       [x_hi | x_lo] @ [[C limbs], [M limbs]] = [P1 | P0]
       x @ M = 256*P1 + P0                            (mod p)
   so each d=64 transform is ONE int8 MXU dot followed by a single
   shift-add + one Barrett (tier-1 bound: |256*P1 + P0| < 2^31 - 2^20).

2. **Paired lanes**: a (B, 64) int32 tensor occupies only 64 of the
   VPU's 128 lanes.  The kernel therefore processes polynomials in PAIRS:
   inputs arrive reshaped (free in HBM) to (B/2, 128) rows holding two
   polynomials, the packed weights are laid out block-diagonally
   (256 x 256, with the output columns permuted so [P1|P1'] fills lanes
   0-127 and [P0|P0'] lanes 128-255), and every elementwise stage —
   Barrett chains, pointwise products, limb splits, the whole Garner
   reconstruction — runs on full 128-lane (B/2, 128) tiles.  The MXU does
   2x the useful MACs (block-diagonal zeros); it is idle anyway.

Further VPU cuts: static-multiplier Barrett (`_fmul`) for the Garner
digit chain (6 ops vs the 11-op generic two-step), difference fix-ups
instead of full reductions for mod-p subtractions of reduced values, one
fused combine reduction, and centered intermediate values (skipping
canonicalization fix-ups between the transform stages).
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

BLOCK = 1024  # polynomial PAIRS per grid step (= 2048 polynomials)


def _split_np_i8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lo = ((x + 128) % 256) - 128
    hi = (x - lo) >> 8
    return hi.astype(np.int8), lo.astype(np.int8)


def _pack_pair_np(M: np.ndarray, p: int) -> np.ndarray:
    """(d, d) twiddle matrix -> (4d, 4d) paired block-diagonal packed int8
    weight for inputs [p0_hi | p1_hi | p0_lo | p1_lo] (each d wide) and
    outputs [P1_0 | P1_1 | P0_0 | P0_1], where P1 = x_hi@C_hi + x_lo@M_hi,
    P0 = x_hi@C_lo + x_lo@M_lo and C = (256*M) mod p."""
    d = M.shape[0]
    C = (M.astype(np.int64) * 256) % p
    c_hi, c_lo = _split_np_i8(C)
    m_hi, m_lo = _split_np_i8(M.astype(np.int64))
    W = np.zeros((4 * d, 4 * d), np.int8)
    for slot in range(2):                      # poly slot within the pair
        rhi = slice(slot * d, (slot + 1) * d)          # x_hi rows
        rlo = slice((2 + slot) * d, (3 + slot) * d)    # x_lo rows
        o1 = slice(slot * d, (slot + 1) * d)           # P1 cols
        o0 = slice((2 + slot) * d, (3 + slot) * d)     # P0 cols
        W[rhi, o1] = c_hi
        W[rhi, o0] = c_lo
        W[rlo, o1] = m_hi
        W[rlo, o0] = m_lo
    return W


@lru_cache(maxsize=None)
def _plan_consts(plan: NttPlan):
    """Static per-plan packed twiddles (host numpy — NEVER cache jnp arrays
    here: a first call inside a jit trace would cache tracers and leak them
    into later traces)."""
    P = len(plan.primes)
    Wf = np.stack([_pack_pair_np(plan.V[i], int(plan.primes[i]))
                   for i in range(P)])
    Wi = np.stack([_pack_pair_np(plan.W[i], int(plan.primes[i]))
                   for i in range(P)])
    return Wf, Wi


def _split_i8_arr(x):
    lo = ((x + 128) & 255) - 128
    hi = (x - lo) >> 8
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _limbs2(x):
    """(R, 2d) int32, |x| <= P_MAX -> (R, 4d) int8 [hi | lo]."""
    hi, lo = _split_i8_arr(x)
    return jnp.concatenate([hi, lo], axis=1)


def _barrett2_centered(x, p: int):
    """Float32 Barrett WITHOUT the canonicalization fix-ups: returns
    r =~ x mod p with |r| < p (exact congruence; domain |x| <= 2^31-2^20,
    same argument as modmath.mod_pos).  For p > 1536 ONE round suffices:
    |q1 - x/p| <= 0.5 + 3|x|*2^-24/p < 0.99, and the integer subtraction
    is exact regardless of fl(x)'s rounding — |r| < p directly."""
    inv = np.float32(1.0 / p)
    q1 = jnp.round(x.astype(jnp.float32) * inv).astype(jnp.int32)
    r1 = x - q1 * np.int32(p)
    if p > 1536:
        return r1
    q2 = jnp.round(r1.astype(jnp.float32) * inv).astype(jnp.int32)
    return r1 - q2 * np.int32(p)


def _fmul(t, c: int, p: int):
    """(t * c) mod p in [0, p) for t in [0, p) and STATIC c in [0, p):
    q = round(fl(t) * fl(c/p)) errs by < 0.51, so r = t*c - q*p lands in
    (-p, p) and one conditional add canonicalizes.  6 VPU ops vs the 11 of
    the generic two-step Barrett."""
    fc = np.float32(c / p)
    q1 = jnp.round(t.astype(jnp.float32) * fc).astype(jnp.int32)
    r = t * np.int32(c) - q1 * np.int32(p)
    return jnp.where(r < 0, r + np.int32(p), r)


def _sub_mod(a, b, p: int):
    """(a - b) mod p for a, b in [0, p): one conditional fix-up."""
    r = a - b
    return jnp.where(r < 0, r + np.int32(p), r)


def _transform(x2, w, p: int, dd: int, *, centered_out: bool):
    """Packed paired transform: x2 (R, 4d) int8 limbs @ w (4d, 4d) int8
    -> (R, 2d) int32 values congruent to the modular matmul; in [0, p) if
    canonical, else centered |.| <= (p+1)/2."""
    o = jax.lax.dot_general(x2, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    r = (o[:, :dd] << 8) + o[:, dd:]
    rc = _barrett2_centered(r, p)
    if centered_out:
        return rc           # |rc| < p (one-step) — downstream bounds hold
    rc = jnp.where(rc < 0, rc + np.int32(p), rc)
    if p > 1536:
        return rc           # one-step: |rc| < p before the fix-up
    return jnp.where(rc >= np.int32(p), rc - np.int32(p), rc)


def _garner_out(residues, plan: NttPlan):
    """Cross-prime Garner mixed-radix reconstruction -> [0, q).

    Optimized digit chain: differences of reduced values get a single
    conditional fix-up; static-multiplier products go through `_fmul`; the
    final combination accumulates all digit contributions raw (< 2^30) and
    reduces ONCE, folding in the signed-centering correction."""
    primes = [int(p) for p in plan.primes]
    P = len(primes)
    q = plan.q
    # primes are descending (select_crt_primes), so v[j] (< p_j) can exceed
    # p_k; v[j] < p_j < 2*p_k always (all primes ~2^15), so one conditional
    # subtract reduces the subtrahend before the _sub_mod fix-up.
    def red(x, p):
        return jnp.where(x >= np.int32(p), x - np.int32(p), x)

    v = [residues[0]]
    for k in range(1, P):
        p = primes[k]
        assert primes[0] < 2 * p
        t = _sub_mod(residues[k], red(v[0], p), p)
        t = _fmul(t, int(plan.garner_inv[0, k]), p)
        for j in range(1, k):
            t = _sub_mod(t, red(v[j], p), p)
            t = _fmul(t, int(plan.garner_inv[j, k]), p)
        v.append(t)
    # sign: the integer is >= M/2 iff the mixed-radix digit vector is
    # lexicographically > floor(M/2)'s digits (most-significant = last)
    gt = jnp.zeros(v[0].shape, jnp.bool_)
    for j in range(P):
        mj = np.int32(plan.m_half_digits[j])
        gt = (v[j] > mj) | ((v[j] == mj) & gt)
    # combine: accumulate digit contributions raw and reduce ONCE —
    # chunked so the int32 accumulator stays exact (each term < p_j * q)
    acc = None
    bound = 0
    limit = (1 << 31) - (1 << 20) - plan.m_mod_q
    for j in range(P):
        term_bound = (primes[j] - 1) * (plan.prefix_mod_q[j] or 1)
        if acc is not None and bound + term_bound >= limit:
            acc = _barrett2_centered(acc, q)     # |acc| < q now
            bound = q
        term = v[j] * np.int32(plan.prefix_mod_q[j])
        acc = term if acc is None else acc + term
        bound += term_bound
    acc = acc - jnp.where(gt, np.int32(plan.m_mod_q), 0)
    return mod_pos(acc, q)


def _center_small(x, p: int):
    """One-step centered reduction, exact for |x| < 2^24: r =~ x mod p,
    |r| <= (p+1)/2."""
    inv = np.float32(1.0 / p)
    q1 = jnp.round(x.astype(jnp.float32) * inv).astype(jnp.int32)
    return x - q1 * np.int32(p)


def _make_kernel(plan: NttPlan, hoisted: bool):
    """Paired-lane fused kernel.  hoisted=False: both operands arrive in
    coefficient form; hoisted=True: the second operand arrives
    pre-transformed AND pre-centered (P, R, 2d) — the shape XLA reaches by
    hoisting a constant operand's forward transform out of a scan."""
    primes = plan.primes
    P = len(primes)
    dd = 2 * plan.d            # paired row width
    shared = plan.q <= min(int(p) for p in primes)  # residues == inputs

    def kernel(a_ref, b_ref, wf_ref, wi_ref, out_ref):
        a = a_ref[:]
        if shared:
            a2s = _limbs2(a)
        if not hoisted:
            b = b_ref[:]
            if shared:
                b2s = _limbs2(b)
        residues = []
        for pi in range(P):
            p = int(primes[pi])
            a2 = a2s if shared else _limbs2(_center_small(a, p))
            ahat = _transform(a2, wf_ref[pi], p, dd, centered_out=True)
            if hoisted:
                bhat = b_ref[pi]
            else:
                b2 = b2s if shared else _limbs2(_center_small(b, p))
                bhat = _transform(b2, wf_ref[pi], p, dd, centered_out=True)
            prod = _barrett2_centered(ahat * bhat, p)
            residues.append(_transform(_limbs2(prod), wi_ref[pi], p, dd,
                                       centered_out=False))
        out_ref[:] = _garner_out(residues, plan)

    return kernel


@lru_cache(maxsize=None)
def _build_call(plan: NttPlan, n_pairs: int, hoisted: bool):
    dd = 2 * plan.d
    P = len(plan.primes)
    kernel = _make_kernel(plan, hoisted)
    grid = (n_pairs // BLOCK,) if n_pairs % BLOCK == 0 and n_pairs >= BLOCK \
        else (1,)
    blk = BLOCK if grid[0] > 1 or n_pairs == BLOCK else n_pairs

    def row_spec():
        return pl.BlockSpec((blk, dd), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def bhat_spec():
        return pl.BlockSpec((P, blk, dd), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec():
        return pl.BlockSpec((P, 2 * dd, 2 * dd), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pairs, dd), jnp.int32),
        grid=grid,
        in_specs=[row_spec(), bhat_spec() if hoisted else row_spec(),
                  const_spec(), const_spec()],
        out_specs=row_spec(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pairs * (2 * dd) * (2 * dd) * P
            * (2 if hoisted else 3),
            bytes_accessed=(2 + (2 * P if hoisted else 2)) * n_pairs * dd * 4,
            transcendentals=0,
        ),
    )


def _pad_pairs(x2, d: int):
    """(N, d) -> ((N', d), pad) with N' even and, above 2*BLOCK rows, a
    multiple of 2*BLOCK (the paired grid step)."""
    n = x2.shape[0]
    target = 2 * BLOCK
    if n > target:
        pad = (-n) % target
    else:
        pad = n % 2
    if pad:
        x2 = jnp.concatenate([x2, jnp.zeros((pad, d), x2.dtype)])
    return x2, pad


def negacyclic_polymul_pallas(a: jax.Array, b: jax.Array,
                              plan: NttPlan) -> jax.Array:
    """Exact (a * b) in Rq for (..., d) int32 tensors — fused VMEM pipeline.
    Semantically identical to ops.ntt.negacyclic_polymul."""
    assert plan.q <= P_MAX
    shape = a.shape
    a2 = a.reshape(-1, plan.d)
    b2 = jnp.broadcast_to(b, shape).reshape(-1, plan.d)
    n = a2.shape[0]
    a2, pad = _pad_pairs(a2, plan.d)
    b2, _ = _pad_pairs(b2, plan.d)
    wf, wi = (jnp.asarray(x) for x in _plan_consts(plan))
    ap = a2.reshape(-1, 2 * plan.d)      # paired rows: free in HBM
    bp = b2.reshape(-1, 2 * plan.d)
    out = _build_call(plan, ap.shape[0], False)(ap, bp, wf, wi)
    out = out.reshape(-1, plan.d)
    if pad:
        out = out[:n]
    return out.reshape(shape)


def negacyclic_polymul_pallas_bhat(a: jax.Array, bhat: jax.Array,
                                   plan: NttPlan) -> jax.Array:
    """Fused polymul against a PRE-TRANSFORMED operand bhat (P, ..., d) in
    canonical eval-domain form — the serving shape where one operand is
    fixed across many products (its forward transform is paid once, exactly
    as XLA hoists it on the unfused path).  Semantically identical to
    ``ntt.ntt_inv_modq(ntt.eval_mul(ntt.ntt_fwd(a), bhat))``."""
    assert plan.q <= P_MAX
    shape = a.shape
    P = plan.n_primes
    a2 = a.reshape(-1, plan.d)
    bh = jnp.broadcast_to(bhat, (P,) + shape).reshape(P, -1, plan.d)
    n = a2.shape[0]
    a2, pad = _pad_pairs(a2, plan.d)
    if pad:
        bh = jnp.concatenate(
            [bh, jnp.zeros((P, pad, plan.d), jnp.int32)], axis=1)
    # center bhat per prime once (outside the kernel, loop-invariant under
    # a scan): the kernel's pointwise stage expects |bhat| <= (p+1)/2
    pv = np.asarray([int(p) for p in plan.primes], np.int32)
    half = ((pv + 1) // 2).reshape(P, 1, 1)
    bh = bh - jnp.where(bh > half, pv.reshape(P, 1, 1), 0)
    wf, wi = (jnp.asarray(x) for x in _plan_consts(plan))
    ap = a2.reshape(-1, 2 * plan.d)
    bp = bh.reshape(P, -1, 2 * plan.d)
    out = _build_call(plan, ap.shape[0], True)(ap, bp, wf, wi)
    out = out.reshape(-1, plan.d)
    if pad:
        out = out[:n]
    return out.reshape(shape)
