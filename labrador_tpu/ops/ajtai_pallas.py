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
(c)+(d)), splits to signed int8 limbs, and accumulates limb matmuls per
CRT prime into VMEM scratch; the last K step folds limbs mod p and writes
per-prime residues.  Garner reconstruction mod q runs as a tiny XLA epilog
(zq.fold_res_modq).

Moduli:
  * small q (< 2^15): A values reduce in one int32; witness centered values
    fit 2 signed int8 limbs.
  * big q (2^32-scale, the reference's ``constants.rs:196`` alternative):
    the kernel runs the emulated-u64 Barrett reduction (ops/bigq) on the
    raw Threefry words to get A in [0, q) as 32-bit word pairs, folds each
    per CRT prime, and the witness (signed int32 at big q, magnitude
    bounded by the norm constraint) splits into 4 int8 limbs — same MXU
    contraction, two extra limb dots.

Exactness: A in [0, q); limb products accumulate in int32 (bounds in
comments below); the reconstructed integer |X| <= n*d*q*max|s| < M/2 by
plan_for's prime-coverage rule, so the signed Garner fold is exact.
Reference role: ``proofgen.rs:41-49`` + ``structs.rs:55-72``.
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


def _pick_blocks(kappa: int, nd: int, rd: int, n_primes: int,
                 c_limbs: int = 2) -> tuple[int, int]:
    """(row block, K block) under the 16 MB scoped-VMEM limit.  Live
    buffers: the circulant limb blocks (c_limbs x kc x rd int8), the
    accumulator scratch + output block ((c_limbs+1+1) x P x mb x rd int32),
    and ~6 live (mb, kc) int32 temporaries from the PRG + limb splits."""
    budget = 11 << 20
    kc = nd
    while kc > 4096 or c_limbs * kc * rd > budget // 2 or nd % kc:
        kc -= 1
        while nd % kc:
            kc -= 1
    mb = 1
    for cand in (8, 16, 32, 64, 128):
        est = (6 * 4 * cand * kc + c_limbs * kc * rd
               + (c_limbs + 2) * n_primes * cand * rd * 4)
        if cand <= kappa and kappa % cand == 0 and est <= budget:
            mb = cand
    return mb, kc


def _split8(x):
    lo = ((x + 128) & 255) - 128
    hi = (x - lo) >> 8
    return hi.astype(jnp.int8), lo.astype(jnp.int8)


def _split_limbs8(x: jax.Array, n_limbs: int) -> list[jax.Array]:
    """Signed radix-2^8 limbs (little-endian, each in [-128, 127]) of an
    int32 array.  Exact for |x| <= 127 * (256^n - 1) / 255 (n=4 covers
    |x| < 2^30.99 — every norm-valid witness/digit)."""
    out = []
    v = x
    for _ in range(n_limbs):
        limb = ((v + 128) & 255) - 128
        out.append(limb.astype(jnp.int8))
        v = (v - limb) >> 8
    return out


def digit_limbs(b: int) -> int:
    """Signed int8 limbs needed to represent any balanced digit of base b
    (|digit| <= b // 2) in the radix-2^8 split of ``_split_limbs8``."""
    n, cover = 1, 127
    while cover < b // 2:
        n += 1
        cover = 127 * (256**n - 1) // 255
    return n


def _circulant(vals: jax.Array, params: LabradorParams) -> jax.Array:
    """(r_eff, n, d) signed int32 -> negacyclic circulant (n*d, r_eff*d)
    int32.  r_eff is the tensor's own leading dim — the verifier commits a
    single folded vector (r_eff=1, check 15) with the same kernel the
    prover uses at r_eff=r."""
    p = params
    r_eff = vals.shape[0]
    i = jnp.arange(p.d)[:, None]
    k = jnp.arange(p.d)[None, :]
    idx = (k - i) % p.d
    sign = jnp.where(k >= i, 1, -1).astype(jnp.int32)
    g = vals[:, :, idx] * sign[None, None]         # (r_eff, n, d_i, d_k)
    return jnp.transpose(g, (1, 2, 0, 3)).reshape(p.n * p.d, r_eff * p.d)


def circulant_int8(witness: jax.Array, params: LabradorParams):
    """(r, n, d) witness residues -> negacyclic circulant (n*d, r*d) as
    signed int8 limbs of the centered values, little-endian (lo, hi) —
    the kernel's c_refs[w] carries weight 2^(8w) (small q)."""
    p = params
    s_c = jnp.where(witness > p.q // 2, witness - p.q, witness)
    return _split_limbs8(_circulant(s_c, p), 2)


def circulant_limbs_big(witness_signed: jax.Array,
                        params: LabradorParams) -> list[jax.Array]:
    """Big-q witness (signed int32, (r, n, d)) -> 4 int8 circulant limbs."""
    return _split_limbs8(_circulant(jnp.asarray(witness_signed, jnp.int32),
                                    params), 4)


def _words_mod_p(rh: jax.Array, rl: jax.Array, pr: int) -> jax.Array:
    """(rh*2^32 + rl) mod pr for int32-encoded uint32 words, int32 ops only
    (rh < 2 for q < 2^33).  mod_pos = float-Barrett fast path (no VPU
    integer divide); every intermediate is < 2^30."""
    hi16 = (rl.astype(jnp.uint32) >> 16).astype(jnp.int32)
    lo16 = (rl.astype(jnp.uint32) & jnp.uint32(0xFFFF)).astype(jnp.int32)
    v = mod_pos(mod_pos(hi16, pr) * ((1 << 16) % pr), pr) + mod_pos(lo16, pr)
    v = mod_pos(v + mod_pos(rh, pr) * ((1 << 32) % pr), pr)
    return v


def _make_kernel(params: LabradorParams, plan: NttPlan,
                 mb: int, kc: int, n_kc: int, c_limbs: int):
    p = params
    nd, q = p.n * p.d, p.q
    primes = plan.primes
    P = len(primes)
    big = zq_ops.is_big(q)
    n_acc = c_limbs + 1   # partial sums grouped by limb weight 2^(8w)

    def kernel(key_ref, *refs):
        c_refs = refs[:c_limbs]
        out_ref, acc_ref = refs[c_limbs], refs[c_limbs + 1]
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
        if big:
            # raw 64-bit words -> Barrett mod q (32-bit word pair), exactly
            # the uniform_mod_q big-q path, run inside the kernel
            from .bigq import _u64_mod_q
            x0, x1 = prg.threefry2x32(key_ref[0, 0], key_ref[0, 1],
                                      off[0], off[1])
            a_rh, a_rl = _u64_mod_q((x0.astype(jnp.int32),
                                     x1.astype(jnp.int32)), q)
        else:
            a_tile = prg.uniform_mod_q(key_ref[0, 0], key_ref[0, 1],
                                       off[0], off[1], q)  # (mb, kc) [0, q)

        @pl.when(kcb == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dn = (((1,), (0,)), ((), ()))

        def dot(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=jnp.int32)

        for pi in range(P):
            pr = int(primes[pi])
            if big:
                ap = _words_mod_p(a_rh, a_rl, pr)           # [0, pr)
            else:
                ap = mod_pos(a_tile, pr)                    # [0, pr)
            a_hi, a_lo = _split8(ap)   # a_hi <= 126, |a_lo| <= 128
            a_limb = {0: a_lo, 1: a_hi}
            # per-chunk bounds (kc <= 4096): each weight-w partial sums at
            # most 2 dots of |.| <= kc*128*128 ~ 6.7e7; accumulated over
            # n_kc chunks still < 2^31 for nd <= 2^16.
            for w in range(n_acc):
                terms = [dot(a_limb[la], c_refs[w - la][:])
                         for la in (0, 1) if 0 <= w - la < c_limbs]
                acc_ref[pi, w] += sum(terms)

        @pl.when(kcb == n_kc - 1)
        def _():
            for pi in range(P):
                pr = int(primes[pi])
                res = jnp.zeros_like(acc_ref[pi, 0])
                for w in range(n_acc):
                    cw = (1 << (8 * w)) % pr
                    res = (res + (acc_ref[pi, w] % pr) * cw) % pr
                out_ref[pi] = res

    return kernel


@lru_cache(maxsize=None)
def _build_call(params: LabradorParams, plan: NttPlan, r_eff: int):
    p = params
    nd, rd = p.n * p.d, r_eff * p.d
    P = len(plan.primes)
    c_limbs = 4 if zq_ops.is_big(p.q) else 2
    mb, kc = _pick_blocks(p.kappa, nd, rd, P, c_limbs)
    n_kc = nd // kc
    kernel = _make_kernel(params, plan, mb, kc, n_kc, c_limbs)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, p.kappa, rd), jnp.int32),
        grid=(p.kappa // mb, n_kc),
        in_specs=[pl.BlockSpec((1, 2), lambda i, kcb: (0, 0),
                               memory_space=pltpu.SMEM)] + [
            pl.BlockSpec((kc, rd), lambda i, kcb: (kcb, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(c_limbs)],
        out_specs=pl.BlockSpec((P, mb, rd), lambda i, kcb: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, c_limbs + 1, mb, rd), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (c_limbs + 1) * P * p.kappa * nd * rd,
            bytes_accessed=p.kappa * rd * P * 4 + nd * rd * c_limbs,
            transcendentals=0,
        ),
    )
    return call, mb


def ajtai_commit_pallas(crs_key: jax.Array, witness: jax.Array,
                        params: LabradorParams, plan: NttPlan):
    """t = A s with the virtual CRS expanded in-kernel and the contraction
    on the MXU (circulant matmul — see module docstring).

    crs_key: (2,) uint32; witness: (r_eff, n, d) residues in [0, q) for
    small q, signed int32 for big q (the big-q witness convention) —
    r_eff may differ from params.r (the verifier's check 15 commits the
    single folded vector z with r_eff=1).
    Returns (r_eff, kappa, d) mod q (int32 small q / Zq2 big q) — identical
    to protocol.ajtai_commit.
    """
    p = params
    r_eff = witness.shape[0]
    # raw int32 limb accumulation across K chunks: |partials| <= n*d * 2^14
    assert p.n * p.d <= 1 << 16, "n*d beyond raw-int32 limb accumulation"
    if zq_ops.is_big(p.q):
        c_blocks = circulant_limbs_big(witness, p)
    else:
        c_blocks = circulant_int8(witness, p)
    call, _ = _build_call(p, plan, r_eff)
    key2 = jnp.asarray(crs_key, jnp.uint32).reshape(1, 2)
    res = call(key2, *c_blocks)                   # (P, kappa, r_eff*d)
    t = zq_ops.fold_res_modq(res, plan, signed=True)
    t = zq_ops.reshape(t, (p.kappa, r_eff, p.d))
    return zq_ops.swapaxes(t, 0, 1)               # (r_eff, kappa, d)
