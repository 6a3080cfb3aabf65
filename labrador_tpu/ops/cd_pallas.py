"""Fused Pallas kernel for the u1 C-term and u2 D-term sums.

Both outer-commitment tails have the same shape (``proofgen.rs:126-153``,
``proofgen.rs:364-378``):

    out[row, :] = sum_{lin < L}  M_lin[row, :] (*) dig_lin[:]

where lin walks the (i<=j triangle, digit k) pairs, M_lin is the (kappa_2, d)
CRS column vector C_ijk (or D_ijk) and dig_lin the matching g (or h) digit
polynomial.  The XLA path (protocol._cd_batched_sum) already batches this
into large eval-domain matmuls, but every PRG-expanded M tile round-trips
HBM between expansion and transform.  Here — exactly like ops/u1_pallas —
the whole sum is one int8 MXU matmul  (kappa_2, K) @ (K, d)  with
K = L * d against the negacyclic circulant of the digit stream:

  * M tiles are PRG-expanded from Threefry counters in VMEM (never HBM);
    at big q the emulated-u64 Barrett reduction runs in-kernel on the raw
    Threefry words,
  * digits are small (|centered| <= base // 2), so the circulant side is
    1-2 signed int8 limbs (1 at reference moduli),
  * per grid step the chunk contribution is reduced mod p and added to a
    running residue accumulator; Garner reconstruction mod q is the epilog.

Offset layout per the CRS quirks (structs.rs:90-144): vector (tri, k) lives
at  base + oc * kappa_2 * d  with  oc = tri * t_1 + k  — the t_1 multiplier
applies to BOTH C and D even though C has t_2 digits (structs.rs:106), so oc
is NOT affine in lin when t_used < t_1; the kernel derives it per step from
the linear index.  L is padded to the step grid with zero digits at clamped
offsets (zero circulant rows contribute nothing regardless of PRG values).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import LabradorParams
from .ntt import NttPlan
from .modmath import mod_pos
from . import prg
from . import zq as zq_ops
from .ajtai_pallas import (_split8, _split_limbs8, _words_mod_p,
                           digit_limbs)


def digit_limb_ok(b: int) -> bool:
    """True when every digit of base ``b`` fits one signed int8 limb in both
    decomposition modes: reference-mode quirky digits lie in [0, b//2]
    (centered_rep folds v > b/2 to the positive b - v, util.rs:377-387) and
    exact-mode centered digits in [-b//2, b//2] — magnitude <= b//2 either
    way, the same bound ops/u1_pallas asserts.  Larger bases still run
    fused (multi-limb); this is only the single-limb fast-path predicate."""
    return b // 2 <= 127


def _pick_blocks(kappa_2: int, L_total: int, d: int) -> tuple[int, int]:
    """(row block mb, lin-indices-per-step lc): kc = lc*d capped at 4096
    like ops/u1_pallas, mb sized so the PRG tile temporaries fit VMEM."""
    lc = max(1, min(L_total, 4096 // d))
    mb = 1
    for cand in (8, 16, 32, 64, 128):
        if cand <= kappa_2 and kappa_2 % cand == 0 and cand * lc * d <= (1 << 18):
            mb = cand
    return mb, lc


def circulant_digit_blocks(dig_stream: jax.Array, params: LabradorParams,
                           lc: int, n_limbs: int) -> list[jax.Array]:
    """(L, d) digit tensors -> blocked negacyclic circulant limbs, each
    (n_steps, lc*d, d) int8 of the centered digits, zero-padded to the
    step grid (little-endian limb weight 2^(8w))."""
    p = params
    L = dig_stream.shape[0]
    if zq_ops.is_big(p.q):
        dig_c = jnp.asarray(dig_stream, jnp.int32)   # already signed
    else:
        dig_c = jnp.where(dig_stream > p.q // 2, dig_stream - p.q,
                          dig_stream)
    n_steps = -(-L // lc)
    pad = n_steps * lc - L
    if pad:
        dig_c = jnp.concatenate(
            [dig_c, jnp.zeros((pad, p.d), dig_c.dtype)], axis=0)
    i = jnp.arange(p.d)[:, None]
    k = jnp.arange(p.d)[None, :]
    idx = (k - i) % p.d
    sign = jnp.where(k >= i, 1, -1).astype(jnp.int32)
    circ = dig_c[:, idx] * sign[None]                     # (Lp, d_i, d_k)
    return [l.reshape(n_steps, lc * p.d, p.d)
            for l in _split_limbs8(circ, n_limbs)]


def _make_kernel(params: LabradorParams, plan: NttPlan, base_off: int,
                 t_used: int, L: int, mb: int, lc: int, n_limbs: int):
    p = params
    k2d = p.kappa_2 * p.d
    primes = plan.primes
    P = len(primes)
    big = zq_ops.is_big(p.q)

    def kernel(key_ref, *refs):
        c_refs = refs[:n_limbs]
        out_ref, acc_ref = refs[n_limbs], refs[n_limbs + 1]
        blk = pl.program_id(0)
        s = pl.program_id(1)

        # column offsets oc = (lin // t_used) * t_1 + lin % t_used for this
        # step's lc linear indices (clamped at L-1: the padded digits are
        # zero so those tiles contribute nothing).  Built directly in the
        # flattened (1, lc*d) layout — Mosaic cannot lower a (lc, d) ->
        # (1, lc*d) vector reshape inside the kernel.
        j = jax.lax.broadcasted_iota(jnp.int32, (1, lc * p.d), 1)
        lin = jnp.minimum(s * lc + j // p.d, L - 1)
        oc = (lin // t_used) * p.t_1 + lin % t_used       # (1, lc*d)
        base = prg.offset_const(base_off)
        off = prg.offset_add(base, prg.offset_mul_i32(oc, k2d))
        off = prg.offset_add(off, (jnp.zeros((1, lc * p.d), jnp.uint32),
                                   (j % p.d).astype(jnp.uint32)))
        # row part: global row (blk*mb + r) strides d  (< 2^31, no carry
        # chain needed beyond offset_add's)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0) + blk * mb
        off = prg.offset_add(off, (jnp.zeros((mb, 1), jnp.uint32),
                                   (row_ids * p.d).astype(jnp.uint32)))
        if big:
            from .bigq import _u64_mod_q
            x0, x1 = prg.threefry2x32(key_ref[0, 0], key_ref[0, 1],
                                      off[0], off[1])
            m_rh, m_rl = _u64_mod_q((x0.astype(jnp.int32),
                                     x1.astype(jnp.int32)), p.q)
        else:
            m_tile = prg.uniform_mod_q(key_ref[0, 0], key_ref[0, 1],
                                       off[0], off[1], p.q)  # (mb, lc*d)

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
                mp = _words_mod_p(m_rh, m_rl, pr)
            else:
                mp = mod_pos(m_tile, pr)
            m_hi, m_lo = _split8(mp)
            m_limb = {0: m_lo, 1: m_hi}
            # per-step int32 bounds: |dot| <= lc*d * 128 * 128 ~ 6.7e7 for
            # lc*d <= 4096; (dot % pr) * cw < 2^30.  Accumulate mod p each
            # step — the full-L raw sum would overflow int32.
            contrib = jnp.zeros((mb, p.d), jnp.int32)
            for w in range(n_limbs + 1):
                terms = [dot(m_limb[lm], c_refs[w - lm][0])
                         for lm in (0, 1) if 0 <= w - lm < n_limbs]
                cw = (1 << (8 * w)) % pr
                contrib = contrib + mod_pos(mod_pos(sum(terms), pr) * cw, pr)
            acc_ref[pi] = mod_pos(acc_ref[pi] + contrib, pr)

        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc_ref[:]

    return kernel


@lru_cache(maxsize=None)
def _build_call(params: LabradorParams, plan: NttPlan, base_off: int,
                t_used: int, L: int, n_limbs: int):
    p = params
    P = len(plan.primes)
    mb, lc = _pick_blocks(p.kappa_2, L, p.d)
    n_steps = -(-L // lc)
    kernel = _make_kernel(p, plan, base_off, t_used, L, mb, lc, n_limbs)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p.kappa_2 // mb, P, mb, p.d),
                                       jnp.int32),
        grid=(p.kappa_2 // mb, n_steps),
        in_specs=[pl.BlockSpec((1, 2), lambda i, s: (0, 0),
                               memory_space=pltpu.SMEM)] + [
            pl.BlockSpec((1, lc * p.d, p.d), lambda i, s: (s, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_limbs)],
        out_specs=pl.BlockSpec((1, P, mb, p.d), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, mb, p.d), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (n_limbs + 1) * P * p.kappa_2 * L * p.d * p.d,
            bytes_accessed=p.kappa_2 * p.d * P * 4
            + n_steps * lc * p.d * p.d * n_limbs * (p.kappa_2 // mb),
            transcendentals=0,
        ),
    )
    return call, mb, lc


def cd_sum_pallas(crs_key: jax.Array, dig_stream: jax.Array, base_off: int,
                  t_used: int, params: LabradorParams,
                  plan: NttPlan, digit_base: int | None = None):
    """sum_lin M_lin (*) dig_lin -> (kappa_2, d) mod q, with the C (or D)
    vectors PRG-expanded in-kernel and the contraction on the MXU.
    Bit-identical to the XLA protocol._cd_batched_sum (+ INTT).

    dig_stream: (n_tri, t_used, d) digits — residues in [0, q) at small q,
    signed int32 at big q; base_off is the static CRS region start
    (crs._off_c or crs._off_d); digit_base bounds |digit| <= digit_base//2
    for the limb count (defaults to b_1, the u2/D-term base)."""
    p = params
    n_tri, t_u, d = dig_stream.shape
    assert t_u == t_used and d == p.d
    L = n_tri * t_used
    n_limbs = digit_limbs(digit_base if digit_base else p.b_1)
    call, mb, lc = _build_call(p, plan, base_off, t_used, L, n_limbs)
    circ = circulant_digit_blocks(dig_stream.reshape(L, p.d), p, lc,
                                  n_limbs)
    key2 = jnp.asarray(crs_key, jnp.uint32).reshape(1, 2)
    res = call(key2, *circ)                       # (blocks, P, mb, d)
    res = jnp.moveaxis(res, 1, 0).reshape(len(plan.primes), p.kappa_2, p.d)
    return zq_ops.fold_res_modq(res, plan, signed=True)
