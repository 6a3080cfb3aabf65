"""Shared prover/verifier protocol math.

Both engines reuse these kernels — mirroring how the reference verifier
re-derives exactly what the prover computed (``verification.rs:25-148`` vs
``proofgen.rs:30-427``).  Everything operates on batched coefficient or
evaluation-domain tensors; see structs.py for shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .params import LabradorParams, _ceil_log
from .ops import ntt as ntt_ops
from .ops import rq as rq_ops
from .ops import zq as zq_ops
from .ops.modmath import mod_pos, modmul_mm, modmul_mm_p
from .ops.decompose import decompose


class AxisCtx(NamedTuple):
    """Collective context for the kappa-sized CRS consumers.

    When set, ``ajtai_commit`` / ``u1_from_digits`` / ``u2_from_digits``
    run *inside* a shard_map over ``axis``: each device expands only its
    own CRS row/column tiles, computes a partial sum, and one psum (or
    all_gather for the Ajtai rows) over the axis completes the reduction —
    the TPU mapping of the reference's two rayon sites
    (``proofgen.rs:101-124``, ``verification.rs:372-415``).  ``None``
    (default) is the plain single-device path.  Hashable, so it can be a
    static jit argument."""

    axis: str
    n_shards: int


def _axis_psum_eval(acc: jax.Array, plan, ctx: AxisCtx) -> jax.Array:
    """psum an eval-domain per-prime partial over the ctx axis (exact:
    n_shards * p < 2^31 for any realistic mesh)."""
    s = jax.lax.psum(acc, ctx.axis)
    return mod_pos(s, np.asarray(plan.primes))


# ---------------------------------------------------------------------------
# Gram matrix
# ---------------------------------------------------------------------------

def gram_hat(s_hat: jax.Array, plan) -> jax.Array:
    """G_ij = <s_i, s_j> in eval domain: (P, r, n, d) -> (P, r, r, d).
    (proofgen.rs:59-70)"""
    st = jnp.swapaxes(s_hat, -3, -2)
    return ntt_ops.eval_matmul(s_hat, st, plan)


# ---------------------------------------------------------------------------
# First aggregation (proofgen.rs:189-289 / verification.rs:38-89)
# ---------------------------------------------------------------------------

def aggregate_a_pp(a_prime, psi, q: int, plan=None) -> jax.Array:
    """a''_k,ij = sum_l psi_k[l] * a'_l,ij  (Zq scalar scaling, no ring mult).

    a_prime: (L, r, r, d); psi: (ub, L)  ->  (ub, r, r, d).
    Verifier line 3 (verification.rs:38-53); the prover side
    (proofgen.rs:223-231) agrees for L = 1 (the only L the reference runs).

    Big q: per-prime residue arithmetic + one Garner fold (the exact
    integer sum_l psi*a' is < L*q^2 << M, so the fold is exact) — no
    66-bit scalar mulmod ever materializes.
    """
    if not zq_ops.is_big(q):
        terms = mod_pos(psi[:, :, None, None, None] * a_prime[None], q)
        return mod_pos(jnp.sum(terms, axis=1), q)
    pv = np.asarray(plan.primes)
    psi_res = zq_ops.to_res(psi, plan.primes)            # (P, ub, L)
    a_res = zq_ops.to_res(a_prime, plan.primes)          # (P, L, r, r, d)
    t = mod_pos(psi_res[:, :, :, None, None, None] * a_res[:, None], pv)
    out = ntt_ops._mod_sum_p(t, pv, axis=2)              # (P, ub, r, r, d)
    return zq_ops.fold_res_modq(out, plan, signed=False)


def sigma_inv_pi(pi: jax.Array, params: LabradorParams) -> jax.Array:
    """sigma^{-1} applied to every JL-matrix row, viewed as n ring elements.

    pi: (r, 256, n*d) int8 ternary -> (r, 256, n*d) int32 mod q, where each
    row was split into n degree-d polys, conjugated, and re-concatenated
    (proofgen.rs:244-253, verification.rs:79-85).
    """
    p = params
    if zq_ops.is_big(p.q):
        polys = pi.astype(jnp.int32).reshape(p.r, 256, p.n, p.d)
        conj = rq_ops.sigma_inv(polys, None)     # stays signed ternary
    else:
        lifted = mod_pos(pi.astype(jnp.int32), p.q)
        polys = lifted.reshape(p.r, 256, p.n, p.d)
        conj = rq_ops.sigma_inv(polys, p.q)
    return conj.reshape(p.r, 256, p.n * p.d)


def aggregate_phi_pp(phi_prime, psi, omega, pi_sigma: jax.Array,
                     params: LabradorParams, plan=None):
    """phi''_k,i = sum_l psi_k[l] phi'_l,i + sum_{j<256} omega_k[j]
    sigma^{-1}(pi_i^{(j)}).

    phi_prime: (L, r, n, d); psi: (ub, L); omega: (ub, 256);
    pi_sigma: (r, 256, n*d) from sigma_inv_pi  ->  (ub, r, n, d).
    (proofgen.rs:233-256 / verification.rs:60-89)

    Big q: both terms accumulate per-prime and fold once; the exact integer
    (L*q^2 + 256*q in magnitude, signed via the ternary pi) is << M.
    """
    p = params
    ub = psi.shape[0] if not isinstance(psi, zq_ops.Zq2) else psi.hi.shape[0]
    if not zq_ops.is_big(p.q):
        lhs = mod_pos(
            jnp.sum(mod_pos(psi[:, :, None, None, None] * phi_prime[None], p.q),
                    axis=1), p.q)                       # (ub, r, n, d)
        # rhs: contraction over the 256 projection rows — plain Zq matmul
        # omega (ub, 256) @ pi_sigma_i (256, n*d), batched over i
        rhs = modmul_mm(
            jnp.broadcast_to(omega[None], (p.r,) + omega.shape),   # (r, ub, 256)
            pi_sigma, p.q, batch_dims=1)                            # (r, ub, n*d)
        rhs = jnp.moveaxis(rhs, 0, 1).reshape(omega.shape[0], p.r, p.n, p.d)
        return mod_pos(lhs + rhs, p.q)

    pv = np.asarray(plan.primes)
    P = len(pv)
    psi_res = zq_ops.to_res(psi, plan.primes)            # (P, ub, L)
    phi_res = zq_ops.to_res(phi_prime, plan.primes)      # (P, L, r, n, d)
    om_res = zq_ops.to_res(omega, plan.primes)           # (P, ub, 256)
    lhs = ntt_ops._mod_sum_p(
        mod_pos(psi_res[:, :, :, None, None, None] * phi_res[:, None], pv),
        pv, axis=2)                                      # (P, ub, r, n, d)
    pi_res = zq_ops.to_res(pi_sigma, plan.primes)        # (P, r, 256, n*d)
    om_b = jnp.broadcast_to(om_res[:, None], (P, p.r, ub, 256))
    rhs = modmul_mm_p(om_b, pi_res, pv, extra_batch=1)   # (P, r, ub, n*d)
    rhs = jnp.moveaxis(rhs, 1, 2).reshape(P, ub, p.r, p.n, p.d)
    # signed=True: the ternary-pi contraction term can be negative
    return zq_ops.fold_res_modq(mod_pos(lhs + rhs, pv), plan, signed=True)


def b_pp_from_witness(a_pp_hat: jax.Array, phi_pp_hat: jax.Array,
                      s_hat: jax.Array, g_hat: jax.Array, plan) -> jax.Array:
    """b''_k = sum_ij a''_k,ij <s_i,s_j> + sum_i <phi''_k,i, s_i>.

    a_pp_hat: (P, ub, r, r, d); phi_pp_hat: (P, ub, r, n, d);
    s_hat: (P, r, n, d); g_hat: (P, r, r, d)  ->  (ub, d) coeff domain.
    (proofgen.rs:258-278)
    """
    ub = a_pp_hat.shape[1]
    pv = np.asarray(plan.primes)
    P, d = len(pv), a_pp_hat.shape[-1]
    t1 = ntt_ops._mod_sum_p(
        mod_pos(a_pp_hat * g_hat[:, None], pv).reshape(P, ub, -1, d),
        pv, axis=2)
    t2 = ntt_ops._mod_sum_p(
        mod_pos(phi_pp_hat * s_hat[:, None], pv).reshape(P, ub, -1, d),
        pv, axis=2)
    return ntt_ops.ntt_inv_modq(mod_pos(t1 + t2, pv), plan)


def b_pp_expected_const(omega_k, psi_k, projection, b_prime, q: int,
                        plan=None):
    # (plan only required for big q)
    """<omega_k, p> + sum_l psi_k[l] b'_l  (the b'' constant-term check,
    verification.rs:515-551).  omega_k: (ub, 256); psi_k: (ub, L);
    projection: (256,) mod q; b_prime: (L,).  -> (ub,).

    Big q: exact integer < 257*q^2 << M — one per-prime contract + fold."""
    if not zq_ops.is_big(q):
        prod = mod_pos(jnp.sum(mod_pos(omega_k * projection[None], q), axis=1), q)
        s = mod_pos(jnp.sum(mod_pos(psi_k * b_prime[None], q), axis=1), q)
        return mod_pos(prod + s, q)
    pv = np.asarray(plan.primes)
    om_res = zq_ops.to_res(omega_k, plan.primes)         # (P, ub, 256)
    pj_res = zq_ops.to_res(projection, plan.primes)      # (P, 256)
    psi_res = zq_ops.to_res(psi_k, plan.primes)          # (P, ub, L)
    bp_res = zq_ops.to_res(b_prime, plan.primes)         # (P, L)
    prod = ntt_ops._mod_sum_p(
        mod_pos(om_res * pj_res[:, None], pv), pv, axis=2)
    s = ntt_ops._mod_sum_p(
        mod_pos(psi_res * bp_res[:, None], pv), pv, axis=2)
    return zq_ops.fold_res_modq(mod_pos(prod + s, pv), plan, signed=False)


# ---------------------------------------------------------------------------
# Second aggregation (proofgen.rs:295-314 / verification.rs:96-148)
# ---------------------------------------------------------------------------

def phi_weighted_hat(w_hat: jax.Array, phi_hat: jax.Array, plan) -> jax.Array:
    """sum_k w_k * phi_k (ring mults) in eval domain.

    w_hat: (P, K, d) weights; phi_hat: (P, K, ..., d)  ->  (P, ..., d).
    The shared core of both second-aggregation terms; also used standalone
    by the structured recursion state (recursion.FoldedState), whose
    alpha-term streams from the CRS and only the beta-term is dense."""
    pv = np.asarray(plan.primes)
    extra = phi_hat.ndim - 3
    wb = w_hat.reshape(w_hat.shape[:2] + (1,) * extra + (w_hat.shape[-1],))
    return ntt_ops._mod_sum_p(mod_pos(wb * phi_hat, pv), pv, axis=1)


def phi_final_hat(alpha_hat: jax.Array, beta_hat: jax.Array,
                  phi_hat: jax.Array, phi_pp_hat: jax.Array, plan) -> jax.Array:
    """phi_i = sum_k alpha_k phi_k,i + sum_k beta_k phi''_k,i (ring mults).

    alpha_hat: (P, K, d); beta_hat: (P, ub, d); phi_hat: (P, K, r, n, d);
    phi_pp_hat: (P, ub, r, n, d)  ->  (P, r, n, d) eval domain.
    """
    t1 = phi_weighted_hat(alpha_hat, phi_hat, plan)
    t2 = phi_weighted_hat(beta_hat, phi_pp_hat, plan)
    return _eval_add(t1, t2, plan)


def a_final_hat(alpha_hat: jax.Array, beta_hat: jax.Array,
                a_hat: jax.Array, a_pp_hat: jax.Array, plan) -> jax.Array:
    """Canonical a_ij = sum_k alpha_k a_k,ij + sum_k beta_k a''_k,ij
    (verifier line 5, verification.rs:96-111).  Shapes like phi_final_hat
    with (r, r) instead of (r, n).  -> (P, r, r, d) eval domain."""
    return phi_final_hat(alpha_hat, beta_hat, a_hat, a_pp_hat, plan)


def b_final(alpha_hat: jax.Array, beta_hat: jax.Array, b_hat: jax.Array,
            b_pp_hat: jax.Array, plan) -> jax.Array:
    """Canonical b = sum_k alpha_k b_k + sum_k beta_k b''_k (verifier line 7,
    verification.rs:140-148).  b_hat: (P, K, d); b_pp_hat: (P, ub, d)
    -> (d,) coeff domain."""
    pv = np.asarray(plan.primes)
    t1 = ntt_ops._mod_sum_p(mod_pos(alpha_hat * b_hat, pv), pv, axis=1)
    t2 = ntt_ops._mod_sum_p(mod_pos(beta_hat * b_pp_hat, pv), pv, axis=1)
    return ntt_ops.ntt_inv_modq(mod_pos(t1 + t2, pv), plan)


# ---------------------------------------------------------------------------
# Outer commitments u1/u2 (proofgen.rs:100-153, 364-378;
# verification.rs:357-434)
# ---------------------------------------------------------------------------

def _tri_stream(mat_dig: jax.Array, params: LabradorParams) -> jax.Array:
    """(t, r, r, d) digit tensor -> (n_tri, t, d) upper-triangle stream in
    (i<=j, k) order, matching the CRS C/D column layout."""
    p = params
    rows = []
    for i in range(p.r):
        for j in range(i, p.r):
            rows.append(mat_dig[:, i, j, :])
    return jnp.stack(rows)


# Per-scan-step coefficient budget for streamed CRS consumers: group as
# many independent (i,k) pairs per step as fit, so the scan is short
# (dispatch-bound otherwise) and the matmuls are large (MXU-efficient).
U1_STEP_COEFFS = 1 << 25


def u1_from_digits(crs, t_dig: jax.Array, g_dig: jax.Array,
                   params: LabradorParams, plan,
                   ctx: AxisCtx | None = None,
                   use_pallas: bool = False) -> jax.Array:
    """u1 = sum_{i,k} B_ik t_i^{(k)} + sum_{i<=j,k} C_ijk g_ij^{(k)}.

    The lhs is one virtual matmul  [B_0 | ... | B_{rt1-1}] @ concat(t_dig):
    a lax.scan streams column groups of G whole B matrices per step
    (generated on the fly — the CRS never materializes), so the scan is
    r*t_1/G steps of large MXU work instead of r*t_1 serialized matvecs.
    -> (kappa_1, d) coeff domain.  (proofgen.rs:100-153 / verification.rs:357-415)

    With ``ctx``: contraction-sharded over the kappa axis — each device
    expands only its own B column block and C-vector subset, computes a
    local partial of BOTH terms, and a single psum over ``ctx.axis``
    completes u1 (the rayon loop of proofgen.rs:101-124, on chips).
    """
    p = params
    P = len(plan.primes)
    m_total = p.r * p.t_1

    if use_pallas and ctx is None \
            and type(crs).__name__ != "MaterializedCRS":
        from .ops.cd_pallas import cd_sum_pallas
        from .ops.ajtai_pallas import digit_limbs
        if digit_limbs(p.b_1) <= 2:
            # fused kernels: PRG + circulant MXU matmul in VMEM for the
            # B-term (ops/u1_pallas) and the C-term (ops/cd_pallas); 1
            # int8 digit limb at reference moduli, 2 at big q
            from .ops.u1_pallas import u1_bterm_pallas
            bterm = u1_bterm_pallas(crs.key, t_dig, p, plan)  # (k1,d) mod q
            if digit_limbs(p.b_2) <= 2:
                cterm = cd_sum_pallas(crs.key, _tri_stream(g_dig, p),
                                      crs._off_c, p.t_2, p, plan,
                                      digit_base=p.b_2)
            else:
                cterm = ntt_ops.ntt_inv_modq(
                    u1_rhs_hat(crs, g_dig, p, plan), plan)
            return zq_ops.add(bterm, cterm, p.q)
        # digits beyond two int8 limbs: fall through to the XLA path

    t_stream = jnp.swapaxes(t_dig, 0, 1).reshape(m_total, p.kappa, p.d)

    if ctx is not None:
        assert p.kappa % ctx.n_shards == 0, \
            f"kappa={p.kappa} must divide the {ctx.axis} axis ({ctx.n_shards})"
        rows_per = p.kappa // ctx.n_shards
        col0 = jax.lax.axis_index(ctx.axis) * rows_per
        t_loc = jax.lax.dynamic_slice_in_dim(t_stream, col0, rows_per, axis=1)

        def body_loc(acc, m):
            b_blk = crs.b_mat_dyn(m, col0=col0, ncols=rows_per)
            b_hat = ntt_ops.ntt_fwd(b_blk, plan)       # (P, k1, rows, d)
            t_m = jax.lax.dynamic_index_in_dim(t_loc, m, 0, keepdims=False)
            t_hat = ntt_ops.ntt_fwd(t_m[:, None, :], plan)
            prod = ntt_ops.eval_matmul(b_hat, t_hat, plan)[:, :, 0, :]
            return _eval_add(acc, prod, plan), None

        acc0 = jnp.zeros((P, p.kappa_1, p.d), jnp.int32)
        acc, _ = jax.lax.scan(body_loc, acc0, jnp.arange(m_total))
        acc = _eval_add(acc, u1_rhs_hat(crs, g_dig, p, plan, ctx), plan)
        return ntt_ops.ntt_inv_modq(_axis_psum_eval(acc, plan, ctx), plan)

    # group size: G whole B matrices per step within the coefficient budget
    per_pair = p.kappa_1 * p.kappa * p.d
    G = max(1, min(m_total, U1_STEP_COEFFS // max(per_pair, 1)))
    while m_total % G:
        G -= 1
    n_steps = m_total // G

    def body_b(acc, step):
        m0 = step * G
        # (G, kappa_1, kappa, d) group of B matrices at traced base m0
        b_grp = crs._expand_dyn(
            crs._off_b, m0, p.kappa_1 * p.kappa,
            (G, p.kappa_1, p.kappa, p.d),
            (p.kappa_1 * p.kappa, p.kappa * p.d, p.d, 1))
        b_cat = zq_ops.reshape(zq_ops.moveaxis(b_grp, 0, 1),
                               (p.kappa_1, G * p.kappa, p.d))
        t_grp = jax.lax.dynamic_slice_in_dim(t_stream, m0, G, 0)
        t_cat = t_grp.reshape(G * p.kappa, p.d)
        b_hat = ntt_ops.ntt_fwd(b_cat, plan)               # (P,k1,G*kap,d)
        t_hat = ntt_ops.ntt_fwd(t_cat[:, None, :], plan)   # (P,G*kap,1,d)
        prod = ntt_ops.eval_matmul(b_hat, t_hat, plan)[:, :, 0, :]
        return _eval_add(acc, prod, plan), None

    acc0 = jnp.zeros((P, p.kappa_1, p.d), jnp.int32)
    if n_steps == 1:
        acc, _ = body_b(acc0, jnp.int32(0))
    else:
        acc, _ = jax.lax.scan(body_b, acc0, jnp.arange(n_steps))
    acc = _eval_add(acc, u1_rhs_hat(crs, g_dig, p, plan), plan)
    return ntt_ops.ntt_inv_modq(acc, plan)


def _cd_batched_sum(crs, base: int, dig_stream: jax.Array, n_tri: int,
                    t_used: int, params: LabradorParams, plan) -> jax.Array:
    """sum over (tri, k) of  M_{tri,k} * dig[tri,k]  where M vectors live at
    CRS offset (k + t_1*tri) * kappa_2 * d from `base` (the C/D layout with
    its t_1-multiplier quirk, structs.rs:106).  All vectors are generated in
    ONE batched expansion and contracted with a single eval matmul — no
    per-vector scan (that serialization dominated u1/u2 wall time).

    dig_stream: (n_tri, t_used, d) digit polys.  -> (P, kappa_2, d) eval.
    """
    p = params
    # chunk the triangle axis if a full batch would exceed the step budget
    per_tri = t_used * p.kappa_2 * p.d
    tri_chunk = max(1, min(n_tri, U1_STEP_COEFFS // max(per_tri, 1)))
    while n_tri % tri_chunk:
        tri_chunk -= 1

    def chunk_sum(acc, c):
        tri0 = c * tri_chunk
        grp = crs._expand_dyn(
            base, tri0, p.t_1 * p.kappa_2 * p.d,
            (tri_chunk, t_used, p.kappa_2, p.d),
            (p.t_1 * p.kappa_2 * p.d, p.kappa_2 * p.d, p.d, 1))
        m = tri_chunk * t_used
        mats = zq_ops.moveaxis(zq_ops.reshape(grp, (m, p.kappa_2, p.d)), 0, 1)
        mats_hat = ntt_ops.ntt_fwd(mats, plan)                 # (P,k2,m,d)
        digs = jax.lax.dynamic_slice_in_dim(dig_stream, tri0, tri_chunk, 0)
        dig_hat = ntt_ops.ntt_fwd(digs.reshape(m, p.d)[:, None, :], plan)
        prod = ntt_ops.eval_matmul(mats_hat, dig_hat, plan)[:, :, 0, :]
        return _eval_add(acc, prod, plan), None

    acc0 = jnp.zeros((len(plan.primes), p.kappa_2, p.d), jnp.int32)
    if n_tri == tri_chunk:
        acc, _ = chunk_sum(acc0, jnp.int32(0))
    else:
        acc, _ = jax.lax.scan(chunk_sum, acc0,
                              jnp.arange(n_tri // tri_chunk))
    return acc


def _cd_sharded_partial(crs, base: int, dig_stream: jax.Array, n_tri: int,
                        t_used: int, params: LabradorParams, plan,
                        ctx: AxisCtx) -> jax.Array:
    """This device's partial of  sum_{tri,k} M_{tri,k} * dig[tri,k]  with
    the linear (tri, k) index space sharded over ``ctx.axis``.  The CRS
    column offsets follow the t_1-multiplier layout (structs.rs:106):
    oc(tri, k) = tri * t_1 + k — NOT affine in the linear index when
    t_used < t_1, so per-tile offsets go through the vectorized
    ``_expand_dyn`` (idx0 broadcast as (G, 1, 1)).  -> (P, kappa_2, d)
    eval partial; caller psums."""
    p = params
    L = n_tri * t_used
    Lp = -(-L // ctx.n_shards)
    idx = jax.lax.axis_index(ctx.axis)
    lin = idx * Lp + jnp.arange(Lp, dtype=jnp.int32)          # (Lp,)
    lin_c = jnp.minimum(lin, L - 1)                            # clamp pads
    oc = (lin_c // t_used) * p.t_1 + (lin_c % t_used)
    # padded digits are zero, so clamped-offset tiles contribute nothing
    dig_flat = dig_stream.reshape(L, p.d)
    pad = Lp * ctx.n_shards - L
    if pad:
        dig_flat = jnp.concatenate(
            [dig_flat, jnp.zeros((pad, p.d), dig_flat.dtype)], axis=0)
    dig_loc = jax.lax.dynamic_slice_in_dim(dig_flat, idx * Lp, Lp, 0)
    mats = crs._expand_dyn(base, oc.reshape(Lp, 1, 1), p.kappa_2 * p.d,
                           (Lp, p.kappa_2, p.d), (0, p.d, 1))
    mats_hat = ntt_ops.ntt_fwd(
        zq_ops.moveaxis(mats, 0, 1), plan)                    # (P,k2,Lp,d)
    dig_hat = ntt_ops.ntt_fwd(dig_loc[:, None, :], plan)      # (P,Lp,1,d)
    return ntt_ops.eval_matmul(mats_hat, dig_hat, plan)[:, :, 0, :]


def u1_rhs_hat(crs, g_dig: jax.Array, params: LabradorParams, plan,
               ctx: AxisCtx | None = None) -> jax.Array:
    """Eval-domain sum_{i<=j,k} C_ijk g_ij^{(k)} (local partial if ctx)."""
    p = params
    g_stream = _tri_stream(g_dig, p)                            # (tri, t2, d)
    if ctx is not None:
        return _cd_sharded_partial(crs, crs._off_c, g_stream,
                                   g_stream.shape[0], p.t_2, p, plan, ctx)
    return _cd_batched_sum(crs, crs._off_c, g_stream, g_stream.shape[0],
                           p.t_2, p, plan)


def u2_from_digits(crs, h_dig: jax.Array, params: LabradorParams,
                   plan, ctx: AxisCtx | None = None,
                   use_pallas: bool = False) -> jax.Array:
    """u2 = sum_{i<=j, k<t_1} D_ijk h_ij^{(k)}  ->  (kappa_2, d).
    (proofgen.rs:364-378 / verification.rs:421-434)
    With ``ctx``: the (tri, k) terms are sharded over the axis + one psum
    (the verifier-side rayon site, verification.rs:372-415).
    ``use_pallas``: fused PRG + circulant MXU kernel (ops/cd_pallas)."""
    p = params
    h_stream = _tri_stream(h_dig, p)                            # (tri, t1, d)
    if use_pallas and ctx is None \
            and type(crs).__name__ != "MaterializedCRS":
        from .ops.cd_pallas import cd_sum_pallas
        from .ops.ajtai_pallas import digit_limbs
        if digit_limbs(p.b_1) <= 2:
            return cd_sum_pallas(crs.key, h_stream, crs._off_d, p.t_1,
                                 p, plan, digit_base=p.b_1)
    if ctx is not None:
        part = _cd_sharded_partial(crs, crs._off_d, h_stream,
                                   h_stream.shape[0], p.t_1, p, plan, ctx)
        return ntt_ops.ntt_inv_modq(_axis_psum_eval(part, plan, ctx), plan)
    acc = _cd_batched_sum(crs, crs._off_d, h_stream, h_stream.shape[0],
                          p.t_1, p, plan)
    return ntt_ops.ntt_inv_modq(acc, plan)


def _eval_add(a, b, plan):
    return mod_pos(a + b, np.asarray(plan.primes))


def _eval_scale(vec_hat, poly_hat, plan):
    """(P, m, d) pointwise-scaled by (P, d) ring element."""
    return mod_pos(vec_hat * poly_hat[:, None, :], np.asarray(plan.primes))


# ---------------------------------------------------------------------------
# Ajtai commitment
# ---------------------------------------------------------------------------

# Tiling thresholds for streaming CRS consumers (SURVEY.md hard part (c):
# never materialize kappa_1 x kappa matrices).  Tiles are sized so the
# transient coefficient + eval tensors stay well under HBM capacity even at
# kappa ~ 2^14.
AJTAI_ROW_TILE = 2048
U1_COL_TILE = 512


def ajtai_commit(crs, s_hat: jax.Array, params: LabradorParams,
                 plan, use_pallas: bool = False,
                 ctx: AxisCtx | None = None,
                 s_coeff: jax.Array | None = None) -> jax.Array:
    """t_i = A s_i for all i: (P, r, n, d) witness -> (r, kappa, d) coeff.
    Row-tiled when kappa is large: A tiles are PRG-expanded, transformed,
    multiplied, and discarded inside a scan.  (proofgen.rs:41-49)

    use_pallas=True runs the fully fused Pallas kernel (ops/ajtai_pallas):
    PRG + circulant MXU matmul in one VMEM-resident pass — bit-identical
    output.  It consumes the coefficient-domain witness (``s_coeff``,
    derived from s_hat if not supplied).

    With ``ctx``: row-sharded — each device expands only its own kappa-row
    block of A, computes its slice of t, and an all_gather over ``ctx.axis``
    assembles the transcript tensor."""
    if use_pallas and ctx is None \
            and type(crs).__name__ != "MaterializedCRS" \
            and params.n * params.d <= (1 << 16) \
            and (s_hat.shape[1] == 1
                 or (s_hat.shape[1] * params.d) % 128 == 0):
        # Two fused-kernel shape limits (folded recursion instances land
        # outside both; stream via XLA instead): n*d above 2^16 exceeds
        # the raw-int32 limb accumulation bound (ops/ajtai_pallas), and an
        # odd r_eff makes the kernel's (.., r_eff*d) scratch last-dim not
        # 128-divisible (Pallas TPU lowering rejects it; r_eff=1 works as
        # the dim equals the whole array).
        from .ops.ajtai_pallas import ajtai_commit_pallas
        if s_coeff is None:
            s_coeff = ntt_ops.ntt_inv_modq(s_hat, plan)
        if zq_ops.is_big(params.q) and isinstance(s_coeff, zq_ops.Zq2):
            # kernel consumes the signed-int32 big-q witness convention
            s_coeff = zq_ops.to_signed_small(s_coeff, params.q)
        return ajtai_commit_pallas(crs.key, s_coeff, params, plan)
    p = params
    st = jnp.swapaxes(s_hat, -3, -2)                       # (P, n, r, d)

    if ctx is not None:
        assert p.kappa % ctx.n_shards == 0, \
            f"kappa={p.kappa} must divide the {ctx.axis} axis ({ctx.n_shards})"
        rows_per = p.kappa // ctx.n_shards
        row0 = jax.lax.axis_index(ctx.axis) * rows_per
        a_blk = crs.a_rows_dyn(row0, rows_per)             # (rows, n, d)
        a_hat = ntt_ops.ntt_fwd(a_blk, plan)
        t_hat = ntt_ops.eval_matmul(a_hat, st, plan)       # (P, rows, r, d)
        t_loc = zq_ops.swapaxes(ntt_ops.ntt_inv_modq(t_hat, plan), 0, 1)
        return zq_ops.tmap(
            lambda x: jax.lax.all_gather(x, ctx.axis, axis=1, tiled=True),
            t_loc)                                         # (r, kappa, d)
    if p.kappa <= AJTAI_ROW_TILE or p.kappa % AJTAI_ROW_TILE != 0:
        a_hat = ntt_ops.ntt_fwd(crs.a_rows(), plan)        # (P, kappa, n, d)
        t_hat = ntt_ops.eval_matmul(a_hat, st, plan)       # (P, kappa, r, d)
        t = ntt_ops.ntt_inv_modq(t_hat, plan)
        return zq_ops.swapaxes(t, 0, 1)

    n_tiles = p.kappa // AJTAI_ROW_TILE

    def body(_, i):
        a_blk = crs.a_rows_dyn(i * AJTAI_ROW_TILE, AJTAI_ROW_TILE)
        a_hat = ntt_ops.ntt_fwd(a_blk, plan)
        t_hat = ntt_ops.eval_matmul(a_hat, st, plan)       # (P, tile, r, d)
        return None, ntt_ops.ntt_inv_modq(t_hat, plan)     # (tile, r, d)

    _, tiles = jax.lax.scan(body, None, jnp.arange(n_tiles))
    t = zq_ops.reshape(tiles, (p.kappa, p.r, p.d))
    return zq_ops.swapaxes(t, 0, 1)


def _decompose_protocol(x, base: int, ndig: int, q: int,
                        mode: str) -> jax.Array:
    """Protocol-level decomposition -> digits.

    mode='reference': digits of the raw residue with the quirky centered_rep
    rule (bit-compatible with the reference), stored as residues mod q.
    mode='exact': balanced digits of the *centered* representative — exact
    reconstruction mod q, small digit norms, and recomposable by the
    recursion layer (recursion.py re-derives exactly these digits from the
    transcript).

    Big q (two-limb input): always balanced/exact digits, returned *signed*
    int32 (the big-q convention for small-valued tensors); the reference
    mode has nothing to be bit-compatible with there — the reference cannot
    run a 2^32-scale modulus correctly (``algebraic.rs:417-419``)."""
    if zq_ops.is_big(q):
        return zq_ops.decompose_balanced_big(x, base, ndig, q)
    if mode == "exact":
        x = jnp.where(x > q // 2, x - q, x)
    digs = decompose(x, base, ndig, mode)
    return mod_pos(digs, q)


def decompose_t(t: jax.Array, params: LabradorParams, mode: str) -> jax.Array:
    """(r, kappa, d) -> (t_1, r, kappa, d) digits (residues mod q)."""
    return _decompose_protocol(t, params.b_1, params.t_1, params.q, mode)


def decompose_g(g: jax.Array, params: LabradorParams, mode: str) -> jax.Array:
    return _decompose_protocol(g, params.b_2, params.t_2, params.q, mode)


def decompose_h(h: jax.Array, params: LabradorParams, mode: str) -> jax.Array:
    return _decompose_protocol(h, params.b_1, params.t_1, params.q, mode)


def decompose_z(z: jax.Array, params: LabradorParams, mode: str,
                ndig: int = 0) -> jax.Array:
    """Verifier line 10 (z = z^(0) + z^(1) b, verification.rs:183-185).

    mode='reference' keeps the reference's fixed 2-digit truncation; in
    exact mode the digit count is ceil_log_b(q) so the stream reconstructs
    z exactly — the same z digits the recursion folds into the next
    witness (recursion.build_witness), and the count params._digit_budget
    assumes for Check 14."""
    if ndig == 0:
        ndig = 2 if mode == "reference" else _ceil_log(params.q, params.b)
    return _decompose_protocol(z, params.b, ndig, params.q, mode)
