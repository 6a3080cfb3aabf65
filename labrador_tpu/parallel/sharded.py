"""Multi-chip prover: shard_map over a (dp, rows) mesh.

Parallel decomposition (SURVEY.md §5.8 — the mapping from the reference's
rayon loops to mesh axes is 1:1 because every reduction is a sum over
independent (row, witness-index, digit) contributions):

  * ``dp``   axis shards a *batch* of independent proof instances.
  * ``rows`` axis shards the kappa dimension: each device PRG-expands only
    its own CRS row/column tiles (the CRS never materializes anywhere),
    computes its slice of the Ajtai commitment t = A s, and its partial
    contribution to the outer commitment u1; one ``psum`` over ``rows``
    (riding ICI) completes each reduction.

Everything else (aggregations, JL, h, u2, z — all small relative to the
kappa-sized work) is computed replicated inside each dp shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..params import LabradorParams
from ..ops import ntt as ntt_ops
from ..ops.modmath import mod_pos
from .. import protocol, sampling
from ..structs import State, Transcript
from ..prover import (_jl_with_retries, _vkey, TAG_JL, TAG_PSI, TAG_OMEGA,
                      TAG_ALPHA, TAG_BETA, TAG_CHALLENGE)


def _ajtai_rows_local(crs, s_hat, params, plan, rows_per: int):
    """This device's kappa-slice of t = A s: (r, rows_per, d)."""
    idx = jax.lax.axis_index("rows")
    a_blk = crs.a_rows_dyn(idx * rows_per, rows_per)       # (rows, n, d)
    a_hat = ntt_ops.ntt_fwd(a_blk, plan)
    st = jnp.swapaxes(s_hat, -3, -2)                       # (P, n, r, d)
    t_hat = ntt_ops.eval_matmul(a_hat, st, plan)           # (P, rows, r, d)
    t = ntt_ops.ntt_inv_modq(t_hat, plan)
    return jnp.swapaxes(t, 0, 1)                           # (r, rows, d)


def _u1_lhs_partial(crs, t_dig_loc, params, plan, rows_per: int):
    """Partial u1 lhs from this device's kappa-slice of the t digits:
    contraction-sharded sum_{i,k} B_ik[:, local cols] t_i^{(k)}[local],
    scanned over the linear B-matrix index m = i*t_1 + k."""
    p = params
    idx = jax.lax.axis_index("rows")
    col0 = idx * rows_per
    t_stream = jnp.swapaxes(t_dig_loc, 0, 1).reshape(
        p.r * p.t_1, rows_per, p.d)
    P = len(plan.primes)

    def body(acc, m):
        b_blk = crs.b_mat_dyn(m, col0=col0, ncols=rows_per)
        b_hat = ntt_ops.ntt_fwd(b_blk, plan)               # (P,k1,rows,d)
        t_m = jax.lax.dynamic_index_in_dim(t_stream, m, 0, keepdims=False)
        t_hat = ntt_ops.ntt_fwd(t_m[:, None, :], plan)
        prod = ntt_ops.eval_matmul(b_hat, t_hat, plan)[:, :, 0, :]
        return protocol._eval_add(acc, prod, plan), None

    acc0 = jnp.zeros((P, p.kappa_1, p.d), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(p.r * p.t_1))
    return acc                                             # (P, kappa_1, d)


def _prove_sharded_core(params: LabradorParams, n_rows: int,
                        decomp_mode: str,
                        witness, state: State, crs, verifier_key):
    """Runs inside shard_map: witness/state/key replicated across rows,
    CRS tiles generated per device; two psum reductions over 'rows'."""
    p = params
    plan = ntt_ops.plan_for(p)
    assert p.kappa % n_rows == 0, "kappa must divide the rows axis"
    rows_per = p.kappa // n_rows

    s_hat = ntt_ops.ntt_fwd(witness, plan)

    # step 1 (rows-sharded): local t slice, all_gather for the transcript
    t_loc = _ajtai_rows_local(crs, s_hat, p, plan, rows_per)  # (r, rows, d)
    t = jax.lax.all_gather(t_loc, "rows", axis=1, tiled=True)  # (r, kappa, d)

    # step 2: Gram (replicated — r x r is tiny)
    g_hat = protocol.gram_hat(s_hat, plan)
    g = ntt_ops.ntt_inv_modq(g_hat, plan)

    # step 3 (contraction-sharded): u1 lhs partial + psum; rhs replicated
    t_dig_loc = protocol.decompose_t(t_loc, p, decomp_mode)
    g_dig = protocol.decompose_g(g, p, decomp_mode)
    lhs_part = _u1_lhs_partial(crs, t_dig_loc, p, plan, rows_per)
    lhs = jnp.stack([
        mod_pos(jax.lax.psum(lhs_part[pi], "rows"), pr)
        for pi, pr in enumerate(plan.primes)])
    rhs = _u1_rhs(crs, g_dig, p, plan)
    u_1 = ntt_ops.ntt_inv_modq(protocol._eval_add(lhs, rhs, plan), plan)

    # steps 4-9: replicated (all small); same math as prover.prove_impl
    witness_flat = witness.reshape(p.r, p.n * p.d)
    pi_m, proj_int, jl_ok = _jl_with_retries(
        _vkey(verifier_key, TAG_JL), witness_flat, p)
    projection = mod_pos(proj_int, p.q)

    ub = p.upper_bound
    psi = jax.vmap(lambda i: sampling.sample_psi(
        _vkey(verifier_key, TAG_PSI, i), p))(jnp.arange(ub))
    omega = jax.vmap(lambda i: sampling.sample_omega(
        _vkey(verifier_key, TAG_OMEGA, i), p))(jnp.arange(ub))

    a_prime = state.a_prime_k[: p.l_count]
    phi_prime = state.phi_prime_k[: p.l_count]
    a_pp = protocol.aggregate_a_pp(a_prime, psi, p.q)
    pi_sigma = protocol.sigma_inv_pi(pi_m, p)
    phi_pp = protocol.aggregate_phi_pp(phi_prime, psi, omega, pi_sigma, p)

    a_pp_hat = ntt_ops.ntt_fwd(a_pp, plan)
    phi_pp_hat = ntt_ops.ntt_fwd(phi_pp, plan)
    g_hat_red = ntt_ops.ntt_fwd(g, plan)
    b_pp = protocol.b_pp_from_witness(a_pp_hat, phi_pp_hat, s_hat,
                                      g_hat_red, plan)
    expected = protocol.b_pp_expected_const(
        omega, psi, projection, state.b_prime_k[: p.l_count], p.q)
    b_pp_ok = jnp.all(b_pp[:, 0] == expected)

    alpha = sampling.sample_alpha(_vkey(verifier_key, TAG_ALPHA), p)
    beta = sampling.sample_beta(_vkey(verifier_key, TAG_BETA), p)
    alpha_hat = ntt_ops.ntt_fwd(alpha, plan)
    beta_hat = ntt_ops.ntt_fwd(beta, plan)
    phi_hat = ntt_ops.ntt_fwd(state.phi_k, plan)
    phi_fin_hat = protocol.phi_final_hat(alpha_hat, beta_hat,
                                         phi_hat, phi_pp_hat, plan)
    phi_fin = ntt_ops.ntt_inv_modq(phi_fin_hat, plan)
    phi_fin_hat_red = ntt_ops.ntt_fwd(phi_fin, plan)

    st = jnp.swapaxes(s_hat, -3, -2)
    m_hat = ntt_ops.eval_matmul(phi_fin_hat_red, st, plan)
    m = ntt_ops.ntt_inv_modq(m_hat, plan)
    h = mod_pos(mod_pos(m + jnp.swapaxes(m, 0, 1), p.q) * p.inv2, p.q)

    h_dig = protocol.decompose_h(h, p, decomp_mode)
    u_2 = protocol.u2_from_digits(crs, h_dig, p, plan)

    c = jax.vmap(lambda i: sampling.sample_challenge(
        _vkey(verifier_key, TAG_CHALLENGE, i), p))(jnp.arange(p.r))
    c_hat = ntt_ops.ntt_fwd(c, plan)
    z_terms = []
    for pi_, pr in enumerate(plan.primes):
        prod = mod_pos(c_hat[pi_][:, None, :] * s_hat[pi_], pr)
        z_terms.append(ntt_ops._mod_sum(prod, pr, axis=0))
    z = ntt_ops.ntt_inv_modq(jnp.stack(z_terms), plan)

    return Transcript(u_1=u_1, pi=pi_m, projection=projection, psi=psi,
                      omega=omega, b_prime_prime=b_pp, alpha=alpha,
                      beta=beta, u_2=u_2, c=c, z=z, t=t, g=g, h=h,
                      jl_ok=jl_ok, b_pp_ok=b_pp_ok)


def _u1_rhs(crs, g_dig, params, plan):
    return protocol.u1_rhs_hat(crs, g_dig, params, plan)


def make_sharded_prover(params: LabradorParams, mesh: Mesh,
                        decomp_mode: str = "reference"):
    """Returns a jitted function

        fn(witness (B,r,n,d), state (B-batched pytree), crs_keys (B,2),
           verifier_keys (B,...)) -> Transcript batch

    with the proof batch sharded over the mesh's `dp` axis and the
    kappa-sized phases sharded over `rows`.
    """
    from ..crs import CRS
    n_rows = mesh.shape["rows"]
    core = partial(_prove_sharded_core, params, n_rows, decomp_mode)

    def per_instance(witness, state, crs_key, vkey):
        crs = CRS(key=crs_key, params=params)
        return core(witness, state, crs, vkey)

    def batched(witness_b, state_b, crs_keys_b, vkeys_b):
        return jax.vmap(per_instance)(witness_b, state_b, crs_keys_b, vkeys_b)

    pspec_batch = P("dp")
    f = shard_map(
        batched, mesh=mesh,
        in_specs=(pspec_batch, pspec_batch, pspec_batch, pspec_batch),
        out_specs=pspec_batch,
        check_rep=False,
    )
    return jax.jit(f)
