"""The LaBRADOR verifier: protocol lines 1-20 as device reductions.

Re-designs ``Verifier::verify`` (``/root/reference/src/verification.rs:25-438``)
reusing the prover's kernels (protocol.py).  Returns a per-check report so
failures are attributable; the overall verdict is the conjunction of the 14
checks — the exact acceptance predicate of the reference.

Check 14 runs with **exact integer accumulation** by default (fixing the
reference's f64 precision bug at large q, ``README.md:10``); a
reference-faithful f64 mode is available for parity studies.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .params import LabradorParams
from .ops import ntt as ntt_ops
from .ops import zq as zq_ops
from .ops.modmath import mod_pos, u64_sum, u64_leq_const
from . import protocol, sampling
from .oracle import FiatShamirOracle, DOM_U1, DOM_JL, DOM_BPP, DOM_U2
from .prover import (TAG_JL, TAG_PSI, TAG_OMEGA, TAG_ALPHA, TAG_BETA,
                     TAG_CHALLENGE)
from .structs import State, Transcript


def check14_norm_bound(p: LabradorParams, z, z_dig, t_dig, g_dig, h_dig,
                       norm_mode: str = "exact") -> jax.Array:
    """Check 14 (verification.rs:231-267): sum of squared digit norms
    <= beta'^2, plus — in exact mode — the amortized opening's own norm
    bound ||z||^2 <= 2*gamma (= 2*tau*beta^2).

    The z-norm conjunct is the paper's actual extraction bound: digit
    magnitudes are <= b//2 by construction, so a digit-norm bound alone
    can never constrain ||z|| (the quantity Module-SIS extraction needs
    short).  The reference folds z's 2-digit truncation into the digit sum
    instead, which bounds nothing about z; exact mode checks both.  The
    factor 2 over the expectation E||z||^2 = tau*||s||^2 <= gamma is ~8
    sigma at n*d >= 128 coefficients — honest proofs pass deterministically
    in practice, and a per-entry precheck keeps the u64 accumulation exact
    against adversarial wrap (same pattern as fs_jl_norm).

    Norms are over the *centered* digit values: identical to the reference
    for its always-nonneg-small centered_rep digits, and the only sensible
    semantics for exact-mode balanced digits (negatives stored as q-|v|).
    Big-q digits are already signed (the small-tensor convention).

    norm_mode='exact' accumulates in emulated u64 (always exact);
    norm_mode='f64_reference' reproduces the reference's float-accumulation
    bug class (util.rs:196-201 casts integer sums to floats; on TPU the
    float path is f32, where the precision loss the reference's README.md:10
    admits to at large q is directly demonstrable — see
    tests/test_bigq_pipeline.py divergence test)."""
    def _c(digs):
        if zq_ops.is_big(p.q):
            return digs
        return jnp.where(digs > p.q // 2, digs - p.q, digs)

    if norm_mode == "exact":
        total = u64_sum(jnp.concatenate([
            (_c(z_dig) ** 2).reshape(-1),
            (_c(t_dig) ** 2).reshape(-1),
            (_c(g_dig) ** 2).reshape(-1),
            (_c(h_dig) ** 2).reshape(-1),
        ]))
        ok = u64_leq_const(total, int(p.beta_prime))
        if p.exact_digits:
            z_c = zq_ops.to_signed_small(z, p.q) if zq_ops.is_big(p.q) \
                else jnp.where(z > p.q // 2, z - p.q, z)
            gamma_z = 2 * int(p.gamma)
            entry_max = math.isqrt(gamma_z)
            entries_ok = jnp.all(
                jnp.abs(z_c) <= jnp.int32(min(entry_max, 2**31 - 1)))
            from .ops.modmath import sum_sq_u64
            ok = ok & entries_ok & u64_leq_const(sum_sq_u64(z_c), gamma_z)
        return ok
    elif norm_mode == "f64_reference":
        def fsum(digs):
            per = jnp.sum((_c(digs) ** 2).astype(jnp.float32), axis=-1)
            return jnp.sum(per)
        total_f = fsum(z_dig) + fsum(t_dig) + fsum(g_dig) + fsum(h_dig)
        return total_f <= jnp.float32(p.beta_prime)
    raise ValueError(f"unknown norm_mode {norm_mode!r}")


@partial(jax.jit, static_argnames=("params", "decomp_mode", "norm_mode",
                                   "ctx", "kernel_backend"))
def verify_report(params: LabradorParams, state: State, proof: Transcript,
                  crs, decomp_mode: str = "reference",
                  norm_mode: str = "exact",
                  ctx: protocol.AxisCtx | None = None,
                  kernel_backend: str = "auto") -> dict:
    """All checks; returns {name: bool array} plus 'all'."""
    return verify_report_impl(params, state, proof, crs, decomp_mode,
                              norm_mode, ctx, kernel_backend)


def verify_report_impl(params: LabradorParams, state: State,
                       proof: Transcript, crs,
                       decomp_mode: str = "reference",
                       norm_mode: str = "exact",
                       ctx: protocol.AxisCtx | None = None,
                       kernel_backend: str = "auto") -> dict:
    """Unjitted check pipeline (compose with shard_map — see
    parallel.sharded.make_sharded_verifier).  With ``ctx`` the three
    CRS-re-expanding checks (15, 19, 20 — the verifier's dominant cost, and
    the one site the reference parallelizes, verification.rs:372-415) shard
    their row/contraction work over the mesh axis.  ``kernel_backend`` picks
    the fused Pallas kernels for those same three checks ('auto' = Pallas on
    real TPUs, XLA elsewhere — same rule as prover.prove)."""
    p = params
    plan = ntt_ops.plan_for(p)
    if kernel_backend == "auto":
        kernel_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    use_pallas = kernel_backend == "pallas"
    checks: dict[str, jax.Array] = {}

    # ---- lines 3-7: recomputation (verification.rs:38-148)
    a_prime = zq_ops.index(state.a_prime_k, slice(None, p.l_count))
    phi_prime = zq_ops.index(state.phi_prime_k, slice(None, p.l_count))
    a_pp = protocol.aggregate_a_pp(a_prime, proof.psi, p.q, plan)
    pi_sigma = protocol.sigma_inv_pi(proof.pi, p)
    phi_pp = protocol.aggregate_phi_pp(phi_prime, proof.psi, proof.omega,
                                       pi_sigma, p, plan)

    alpha_hat = ntt_ops.ntt_fwd(proof.alpha, plan)
    beta_hat = ntt_ops.ntt_fwd(proof.beta, plan)
    a_pp_hat = ntt_ops.ntt_fwd(a_pp, plan)
    phi_pp_hat = ntt_ops.ntt_fwd(phi_pp, plan)
    b_hat = ntt_ops.ntt_fwd(state.b_k, plan)
    b_pp_hat = ntt_ops.ntt_fwd(proof.b_prime_prime, plan)

    # CRT-range invariant: reduce mod q between ring-multiplication levels,
    # so every eval-domain factor below is the NTT of a reduced tensor.
    if hasattr(state, "phi_alpha_modq"):
        # structured recursion state (recursion.FoldedState): stream the
        # k'-sized alpha-contractions from the base CRS instead of
        # NTT-ing a dense (K, r, n, d) phi tensor.
        a_beta = ntt_ops.ntt_inv_modq(
            protocol.phi_weighted_hat(beta_hat, a_pp_hat, plan), plan)
        a_fin = zq_ops.add(state.a_alpha_modq(proof.alpha), a_beta, p.q)
        phi_beta = ntt_ops.ntt_inv_modq(
            protocol.phi_weighted_hat(beta_hat, phi_pp_hat, plan), plan)
        phi_fin = zq_ops.add(state.phi_alpha_modq(proof.alpha), phi_beta,
                             p.q)
    else:
        a_hat = ntt_ops.ntt_fwd(state.a_k, plan)
        phi_hat = ntt_ops.ntt_fwd(state.phi_k, plan)
        a_fin = ntt_ops.ntt_inv_modq(
            protocol.a_final_hat(alpha_hat, beta_hat, a_hat, a_pp_hat,
                                 plan), plan)              # (r, r, d)
        phi_fin = ntt_ops.ntt_inv_modq(
            protocol.phi_final_hat(alpha_hat, beta_hat, phi_hat, phi_pp_hat,
                                   plan), plan)            # (r, n, d)
    a_fin_hat = ntt_ops.ntt_fwd(a_fin, plan)
    phi_fin_hat = ntt_ops.ntt_fwd(phi_fin, plan)
    b = protocol.b_final(alpha_hat, beta_hat, b_hat, b_pp_hat, plan)  # (d,)

    # ---- checks 8-9: symmetry (verification.rs:157-178)
    checks["c08_g_symmetric"] = zq_ops.all_eq(proof.g,
                                              zq_ops.swapaxes(proof.g, 0, 1))
    checks["c09_h_symmetric"] = zq_ops.all_eq(proof.h,
                                              zq_ops.swapaxes(proof.h, 0, 1))

    # ---- lines 10-13: decompositions (verification.rs:185-225)
    z_dig = protocol.decompose_z(proof.z, p, decomp_mode)
    t_dig = protocol.decompose_t(proof.t, p, decomp_mode)
    g_dig = protocol.decompose_g(proof.g, p, decomp_mode)
    h_dig = protocol.decompose_h(proof.h, p, decomp_mode)

    # ---- check 14: digit norm bound (verification.rs:231-267).
    checks["c14_norm_bound"] = check14_norm_bound(
        p, proof.z, z_dig, t_dig, g_dig, h_dig, norm_mode)

    # ---- check 15: A z == sum_i c_i t_i (verification.rs:274-296)
    # (A re-expanded from the CRS, row-tiled for large kappa — same
    # streaming kernel as the prover's Ajtai commitment)
    z_hat = ntt_ops.ntt_fwd(proof.z, plan)                     # (P, n, d)
    z_coeff = None
    if use_pallas and not zq_ops.is_big(p.q):
        z_coeff = mod_pos(proof.z, p.q)[None]                  # (1, n, d)
    lhs = zq_ops.index(
        protocol.ajtai_commit(crs, z_hat[:, None, :, :], p, plan, ctx=ctx,
                              use_pallas=use_pallas, s_coeff=z_coeff), 0)
    c_hat = ntt_ops.ntt_fwd(proof.c, plan)                     # (P, r, d)
    t_hat = ntt_ops.ntt_fwd(proof.t, plan)                     # (P,r,kap,d)
    pv = np.asarray(plan.primes)
    rhs = ntt_ops.ntt_inv_modq(ntt_ops._mod_sum_p(
        mod_pos(c_hat[:, :, None, :] * t_hat, pv), pv, axis=1),
        plan)                                                  # (kappa, d)
    checks["c15_az_vs_ct"] = zq_ops.all_eq(lhs, rhs)

    # ---- check 16: <z,z> == sum_ij g_ij c_i c_j (verification.rs:303-314)
    zz = ntt_ops.polyvec_inner_product(proof.z, proof.z, plan)  # (d,)
    g_hat = ntt_ops.ntt_fwd(proof.g, plan)
    # c_i * c_j reduced mod q first (one multiplication level), then its
    # NTT multiplies g/h — keeps every product single-level in the CRT.
    cc_raw = mod_pos(c_hat[:, :, None, :] * c_hat[:, None, :, :], pv)
    cc = ntt_ops.ntt_inv_modq(cc_raw, plan)                     # (r, r, d)
    cc_hat = ntt_ops.ntt_fwd(cc, plan)
    P = len(pv)
    rhs16 = ntt_ops.ntt_inv_modq(ntt_ops._mod_sum_p(
        mod_pos(g_hat * cc_hat, pv).reshape(P, -1, p.d), pv, axis=1), plan)
    checks["c16_zz_vs_gcc"] = zq_ops.all_eq(zz, rhs16)

    # ---- check 17: sum_i <phi_i,z> c_i == sum_ij h_ij c_i c_j
    # (verification.rs:320-334)
    h_hat = ntt_ops.ntt_fwd(proof.h, plan)
    piz_raw = ntt_ops._mod_sum_p(
        mod_pos(phi_fin_hat * z_hat[:, None, :, :], pv), pv,
        axis=2)                                                 # (P, r, d)
    piz = ntt_ops.ntt_inv_modq(piz_raw, plan)                   # reduce level
    piz_hat = ntt_ops.ntt_fwd(piz, plan)
    lhs17 = ntt_ops.ntt_inv_modq(ntt_ops._mod_sum_p(
        mod_pos(piz_hat * c_hat, pv), pv, axis=1), plan)
    rhs17 = ntt_ops.ntt_inv_modq(ntt_ops._mod_sum_p(
        mod_pos(h_hat * cc_hat, pv).reshape(P, -1, p.d), pv, axis=1), plan)
    checks["c17_phiz_vs_hcc"] = zq_ops.all_eq(lhs17, rhs17)

    # ---- check 18: sum_ij a_ij g_ij + sum_i h_ii == b (verification.rs:340-352)
    s1 = ntt_ops.ntt_inv_modq(ntt_ops._mod_sum_p(
        mod_pos(a_fin_hat * g_hat, pv).reshape(P, -1, p.d), pv, axis=1),
        plan)
    if zq_ops.is_big(p.q):
        # total = s1 + sum_i h_ii - b mod q, via one residue fold (the
        # exact integer is in (-q, (r+2) q) << M)
        h_res = zq_ops.to_res(proof.h, plan.primes)       # (P, r, r, d)
        diag = ntt_ops._mod_sum_p(
            mod_pos(jnp.einsum("piid->pid", h_res), pv), pv, axis=1)
        tot = mod_pos(zq_ops.to_res(s1, plan.primes) + diag
                      - zq_ops.to_res(b, plan.primes), pv)
        total = zq_ops.fold_res_modq(tot, plan, signed=True)
        checks["c18_agg_relation"] = jnp.all(zq_ops.is_zero(total))
    else:
        s2 = mod_pos(jnp.sum(jnp.einsum("iid->id", proof.h) % p.q, axis=0),
                     p.q)
        checks["c18_agg_relation"] = jnp.all(mod_pos(s1 + s2 - b, p.q) == 0)

    # ---- check 19: recompute u1 (verification.rs:357-415)
    u1_cand = protocol.u1_from_digits(crs, t_dig, g_dig, p, plan, ctx=ctx,
                                      use_pallas=use_pallas)
    checks["c19_u1"] = zq_ops.all_eq(u1_cand, proof.u_1)

    # ---- check 20: recompute u2 (verification.rs:421-434)
    u2_cand = protocol.u2_from_digits(crs, h_dig, p, plan, ctx=ctx,
                                      use_pallas=use_pallas)
    checks["c20_u2"] = zq_ops.all_eq(u2_cand, proof.u_2)

    # ---- b'' constant-term consistency (verification.rs:532-551; the
    # reference runs this during proving — kept as an explicit check here)
    expected = protocol.b_pp_expected_const(
        proof.omega, proof.psi, proof.projection,
        zq_ops.index(state.b_prime_k, slice(None, p.l_count)), p.q, plan)
    checks["c21_b_pp_const"] = zq_ops.all_eq(
        zq_ops.index(proof.b_prime_prime, (slice(None), 0)), expected)

    core = [v for k, v in checks.items() if not k.startswith("c21")]
    checks["all"] = jnp.all(jnp.stack(core))
    checks["all_with_bpp"] = checks["all"] & checks["c21_b_pp_const"]
    return checks


def verify(params: LabradorParams, state: State, proof: Transcript,
           crs, **kw) -> bool:
    """Boolean verdict over the reference's 14-check predicate."""
    return bool(verify_report(params, state, proof, crs, **kw)["all"])


@partial(jax.jit, static_argnames=("params",))
def fs_challenge_report(params: LabradorParams, state: State,
                        proof: Transcript, crs) -> dict:
    """Non-interactive verification of challenge provenance: re-derive
    every challenge from the SHA-256 transcript hash — seeded with the CRS
    seed, parameters, and statement (FS_SPEC.md §2) — and compare against
    the proof.  Together with verify_report this makes the proof
    self-contained (no trusted verifier randomness)."""
    p = params
    oracle = FiatShamirOracle.create(crs.key, state, params)
    checks: dict[str, jax.Array] = {}

    ost = oracle.init()
    ost = oracle.absorb(ost, DOM_U1, jax.tree.leaves(proof.u_1))

    # JL matrices: must match one of the bounded retry attempts
    jl_base = oracle.challenge_key(ost, TAG_JL)
    pi_match = []
    for a in range(6):
        key_a = jax.random.fold_in(jl_base, a)
        keys = jax.random.split(key_a, p.r)
        pi_a = jax.vmap(lambda k: sampling.sample_jl_matrix(k, p))(keys)
        pi_match.append(jnp.all(pi_a == proof.pi))
    checks["fs_jl_matrix"] = jnp.any(jnp.stack(pi_match))

    # projection norm bound (verification.rs:568-579); transcript stores p
    # mod q, valid projections have |entries| << q/2 so the centered lift
    # recovers the integers.  Per-entry precheck first: every entry of a
    # valid projection must itself satisfy |p_i| <= sqrt(128)*beta, and with
    # all entries bounded the 256-term sum of squares stays < 2^64, which is
    # sum_sq_u64's exactness contract — without it an adversarial transcript
    # with ~2^31 centered entries could wrap the emulated-u64 accumulator
    # mod 2^64 and land under the bound.  (int32 wraps in to_signed_small
    # near q/2 keep magnitudes ~2^31 and still fail the precheck.)
    centered = zq_ops.to_signed_small(proof.projection, p.q)
    from .ops.modmath import sum_sq_u64
    bound = 128 * p.beta_bound * p.beta_bound
    entry_max = math.isqrt(bound)
    entries_ok = jnp.all(jnp.abs(centered) <= jnp.int32(min(entry_max,
                                                            2**31 - 1)))
    checks["fs_jl_norm"] = entries_ok & u64_leq_const(
        sum_sq_u64(centered), bound)

    ost = oracle.absorb(ost, DOM_JL,
                        jax.tree.leaves([proof.pi, proof.projection]))
    ub = p.upper_bound
    psi_d = zq_ops.stack([sampling.sample_psi(
        oracle.challenge_key(ost, TAG_PSI, i), p) for i in range(ub)])
    omega_d = zq_ops.stack([sampling.sample_omega(
        oracle.challenge_key(ost, TAG_OMEGA, i), p) for i in range(ub)])
    checks["fs_psi"] = zq_ops.all_eq(psi_d, proof.psi)
    checks["fs_omega"] = zq_ops.all_eq(omega_d, proof.omega)

    ost = oracle.absorb(ost, DOM_BPP, jax.tree.leaves(proof.b_prime_prime))
    alpha_d = sampling.sample_alpha(oracle.challenge_key(ost, TAG_ALPHA), p)
    beta_d = sampling.sample_beta(oracle.challenge_key(ost, TAG_BETA), p)
    checks["fs_alpha"] = zq_ops.all_eq(alpha_d, proof.alpha)
    checks["fs_beta"] = zq_ops.all_eq(beta_d, proof.beta)

    ost = oracle.absorb(ost, DOM_U2, jax.tree.leaves(proof.u_2))
    c_d = jnp.stack([sampling.sample_challenge(
        oracle.challenge_key(ost, TAG_CHALLENGE, i), p) for i in range(p.r)])
    checks["fs_challenge"] = jnp.all(c_d == proof.c)

    checks["fs_all"] = jnp.all(jnp.stack(list(checks.values())))
    return checks


def verify_fs(params: LabradorParams, state: State, proof: Transcript,
              crs, **kw) -> bool:
    """Full non-interactive verification: the 14 protocol checks, the b''
    constant-term check, and Fiat-Shamir challenge provenance."""
    rep = verify_report(params, state, proof, crs, **kw)
    fs = fs_challenge_report(params, state, proof, crs)
    return bool(rep["all_with_bpp"]) and bool(fs["fs_all"])
