"""Shared prover/verifier protocol math.

Both engines reuse these kernels — mirroring how the reference verifier
re-derives exactly what the prover computed (``verification.rs:25-148`` vs
``proofgen.rs:30-427``).  Everything operates on batched coefficient or
evaluation-domain tensors; see structs.py for shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .params import LabradorParams
from .ops import ntt as ntt_ops
from .ops import rq as rq_ops
from .ops.modmath import mod_pos, modmul_mm
from .ops.decompose import decompose


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

def aggregate_a_pp(a_prime: jax.Array, psi: jax.Array, q: int) -> jax.Array:
    """a''_k,ij = sum_l psi_k[l] * a'_l,ij  (Zq scalar scaling, no ring mult).

    a_prime: (L, r, r, d); psi: (ub, L)  ->  (ub, r, r, d).
    Verifier line 3 (verification.rs:38-53); the prover side
    (proofgen.rs:223-231) agrees for L = 1 (the only L the reference runs).
    """
    terms = mod_pos(psi[:, :, None, None, None] * a_prime[None], q)
    return mod_pos(jnp.sum(terms, axis=1), q)


def sigma_inv_pi(pi: jax.Array, params: LabradorParams) -> jax.Array:
    """sigma^{-1} applied to every JL-matrix row, viewed as n ring elements.

    pi: (r, 256, n*d) int8 ternary -> (r, 256, n*d) int32 mod q, where each
    row was split into n degree-d polys, conjugated, and re-concatenated
    (proofgen.rs:244-253, verification.rs:79-85).
    """
    p = params
    lifted = mod_pos(pi.astype(jnp.int32), p.q)
    polys = lifted.reshape(p.r, 256, p.n, p.d)
    conj = rq_ops.sigma_inv(polys, p.q)
    return conj.reshape(p.r, 256, p.n * p.d)


def aggregate_phi_pp(phi_prime: jax.Array, psi: jax.Array, omega: jax.Array,
                     pi_sigma: jax.Array, params: LabradorParams) -> jax.Array:
    """phi''_k,i = sum_l psi_k[l] phi'_l,i + sum_{j<256} omega_k[j]
    sigma^{-1}(pi_i^{(j)}).

    phi_prime: (L, r, n, d); psi: (ub, L); omega: (ub, 256);
    pi_sigma: (r, 256, n*d) from sigma_inv_pi  ->  (ub, r, n, d).
    (proofgen.rs:233-256 / verification.rs:60-89)
    """
    p = params
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


def b_pp_from_witness(a_pp_hat: jax.Array, phi_pp_hat: jax.Array,
                      s_hat: jax.Array, g_hat: jax.Array, plan) -> jax.Array:
    """b''_k = sum_ij a''_k,ij <s_i,s_j> + sum_i <phi''_k,i, s_i>.

    a_pp_hat: (P, ub, r, r, d); phi_pp_hat: (P, ub, r, n, d);
    s_hat: (P, r, n, d); g_hat: (P, r, r, d)  ->  (ub, d) coeff domain.
    (proofgen.rs:258-278)
    """
    ub = a_pp_hat.shape[1]
    outs = []
    for pi_, p in enumerate(plan.primes):
        t1 = ntt_ops._mod_sum(
            mod_pos(a_pp_hat[pi_] * g_hat[pi_][None], p).reshape(ub, -1, a_pp_hat.shape[-1]),
            p, axis=1)
        t2 = ntt_ops._mod_sum(
            mod_pos(phi_pp_hat[pi_] * s_hat[pi_][None], p).reshape(ub, -1, s_hat.shape[-1]),
            p, axis=1)
        outs.append(mod_pos(t1 + t2, p))
    return ntt_ops.ntt_inv_modq(jnp.stack(outs), plan)


def b_pp_expected_const(omega_k: jax.Array, psi_k: jax.Array,
                        projection: jax.Array, b_prime: jax.Array,
                        q: int) -> jax.Array:
    """<omega_k, p> + sum_l psi_k[l] b'_l  (the b'' constant-term check,
    verification.rs:515-551).  omega_k: (ub, 256); psi_k: (ub, L);
    projection: (256,) mod q; b_prime: (L,).  -> (ub,)."""
    prod = mod_pos(jnp.sum(mod_pos(omega_k * projection[None], q), axis=1), q)
    s = mod_pos(jnp.sum(mod_pos(psi_k * b_prime[None], q), axis=1), q)
    return mod_pos(prod + s, q)


# ---------------------------------------------------------------------------
# Second aggregation (proofgen.rs:295-314 / verification.rs:96-148)
# ---------------------------------------------------------------------------

def phi_final_hat(alpha_hat: jax.Array, beta_hat: jax.Array,
                  phi_hat: jax.Array, phi_pp_hat: jax.Array, plan) -> jax.Array:
    """phi_i = sum_k alpha_k phi_k,i + sum_k beta_k phi''_k,i (ring mults).

    alpha_hat: (P, K, d); beta_hat: (P, ub, d); phi_hat: (P, K, r, n, d);
    phi_pp_hat: (P, ub, r, n, d)  ->  (P, r, n, d) eval domain.
    """
    outs = []
    for pi_, p in enumerate(plan.primes):
        t1 = ntt_ops._mod_sum(
            mod_pos(alpha_hat[pi_][:, None, None, :] * phi_hat[pi_], p),
            p, axis=0)
        t2 = ntt_ops._mod_sum(
            mod_pos(beta_hat[pi_][:, None, None, :] * phi_pp_hat[pi_], p),
            p, axis=0)
        outs.append(mod_pos(t1 + t2, p))
    return jnp.stack(outs)


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
    outs = []
    for pi_, p in enumerate(plan.primes):
        t1 = ntt_ops._mod_sum(mod_pos(alpha_hat[pi_] * b_hat[pi_], p), p, axis=0)
        t2 = ntt_ops._mod_sum(mod_pos(beta_hat[pi_] * b_pp_hat[pi_], p), p, axis=0)
        outs.append(mod_pos(t1 + t2, p))
    return ntt_ops.ntt_inv_modq(jnp.stack(outs), plan)


# ---------------------------------------------------------------------------
# Outer commitments u1/u2 (proofgen.rs:100-153, 364-378;
# verification.rs:357-434)
# ---------------------------------------------------------------------------

def u1_from_digits(crs, t_dig: jax.Array, g_dig: jax.Array,
                   params: LabradorParams, plan) -> jax.Array:
    """u1 = sum_{i,k} B_ik t_i^{(k)} + sum_{i<=j,k} C_ijk g_ij^{(k)}.

    t_dig: (t_1, r, kappa, d) residues mod q; g_dig: (t_2, r, r, d).
    CRS tiles are generated on the fly — B matrices never coexist in memory.
    -> (kappa_1, d) coeff domain.
    """
    p = params
    acc = None
    for i in range(p.r):
        for k in range(p.t_1):
            b_hat = ntt_ops.ntt_fwd(crs.b_rows(i, k), plan)       # (P,k1,kap,d)
            t_hat = ntt_ops.ntt_fwd(t_dig[k, i][:, None, :], plan)  # (P,kap,1,d)
            prod = ntt_ops.eval_matmul(b_hat, t_hat, plan)[:, :, 0, :]
            acc = prod if acc is None else _eval_add(acc, prod, plan)
    for i in range(p.r):
        for j in range(i, p.r):
            for k in range(p.t_2):
                c_hat = ntt_ops.ntt_fwd(crs.c_vec(i, j, k), plan)  # (P,k2,d)
                gd_hat = ntt_ops.ntt_fwd(g_dig[k, i, j], plan)     # (P,d)
                prod = _eval_scale(c_hat, gd_hat, plan)
                acc = _eval_add(acc, prod, plan)
    return ntt_ops.ntt_inv_modq(acc, plan)


def u2_from_digits(crs, h_dig: jax.Array, params: LabradorParams,
                   plan) -> jax.Array:
    """u2 = sum_{i<=j, k<t_1} D_ijk h_ij^{(k)}  ->  (kappa_2, d).
    (proofgen.rs:364-378 / verification.rs:421-434)"""
    p = params
    acc = None
    for i in range(p.r):
        for j in range(i, p.r):
            for k in range(p.t_1):
                d_hat = ntt_ops.ntt_fwd(crs.d_vec(i, j, k), plan)
                hd_hat = ntt_ops.ntt_fwd(h_dig[k, i, j], plan)
                prod = _eval_scale(d_hat, hd_hat, plan)
                acc = prod if acc is None else _eval_add(acc, prod, plan)
    return ntt_ops.ntt_inv_modq(acc, plan)


def _eval_add(a, b, plan):
    outs = [mod_pos(a[pi] + b[pi], p) for pi, p in enumerate(plan.primes)]
    return jnp.stack(outs)


def _eval_scale(vec_hat, poly_hat, plan):
    """(P, m, d) pointwise-scaled by (P, d) ring element."""
    outs = [mod_pos(vec_hat[pi] * poly_hat[pi][None, :], p)
            for pi, p in enumerate(plan.primes)]
    return jnp.stack(outs)


# ---------------------------------------------------------------------------
# Ajtai commitment
# ---------------------------------------------------------------------------

def ajtai_commit(crs, s_hat: jax.Array, params: LabradorParams,
                 plan) -> jax.Array:
    """t_i = A s_i for all i: (P, r, n, d) witness -> (r, kappa, d) coeff.
    (proofgen.rs:41-49)"""
    a_hat = ntt_ops.ntt_fwd(crs.a_rows(), plan)            # (P, kappa, n, d)
    st = jnp.swapaxes(s_hat, -3, -2)                       # (P, n, r, d)
    t_hat = ntt_ops.eval_matmul(a_hat, st, plan)           # (P, kappa, r, d)
    t = ntt_ops.ntt_inv_modq(t_hat, plan)                  # (kappa, r, d)
    return jnp.swapaxes(t, 0, 1)                           # (r, kappa, d)


def decompose_t(t: jax.Array, params: LabradorParams, mode: str) -> jax.Array:
    """(r, kappa, d) -> (t_1, r, kappa, d) digits (residues mod q)."""
    digs = decompose(t, params.b_1, params.t_1, mode)
    return mod_pos(digs, params.q)


def decompose_g(g: jax.Array, params: LabradorParams, mode: str) -> jax.Array:
    digs = decompose(g, params.b_2, params.t_2, mode)
    return mod_pos(digs, params.q)


def decompose_h(h: jax.Array, params: LabradorParams, mode: str) -> jax.Array:
    digs = decompose(h, params.b_1, params.t_1, mode)
    return mod_pos(digs, params.q)
