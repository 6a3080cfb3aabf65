"""The LaBRADOR prover as a single jittable pipeline.

Re-designs ``Prover::proof_gen`` (``/root/reference/src/proofgen.rs:30-427``)
as a pure function of (witness, state, CRS, verifier key): every phase is
batched tensor algebra in the NTT evaluation domain, rejection loops are
bounded ``lax.while_loop``s, and all randomness comes from explicit PRNG
keys — no global state, no host round trips.

Interaction model: the reference prover holds a live ``&Verifier`` and calls
its sampling oracles mid-protocol (``proofgen.rs:20,170,209-210,295-296,388``).
Here the "verifier" is a PRNG key; challenges are derived from tagged
subkeys in protocol order, so an interactive verifier (same key) or a
Fiat-Shamir oracle (oracle.py) can reproduce them.
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
from .ops.modmath import mod_pos, sum_sq_u64, u64_leq_const
from . import protocol, sampling
from .oracle import (InteractiveOracle, FiatShamirOracle,
                     DOM_U1, DOM_JL, DOM_BPP, DOM_U2)
from .structs import State, Transcript

# Verifier-randomness derivation tags (protocol message order)
TAG_JL = 0
TAG_PSI = 1
TAG_OMEGA = 2
TAG_ALPHA = 3
TAG_BETA = 4
TAG_CHALLENGE = 5


def _vkey(key, tag, idx=0):
    return jax.random.fold_in(jax.random.fold_in(key, tag), idx)


def resolve_backend(kernel_backend: str) -> str:
    """Resolve the 'auto' kernel backend exactly once (pallas on TPU, xla
    elsewhere).  Every prover entry point calls this before threading the
    concrete value through all three phases, so the checkpointed/phase-split
    runners use the same kernels as ``prove``."""
    if kernel_backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if kernel_backend not in ("pallas", "xla"):
        raise ValueError(f"unknown kernel_backend {kernel_backend!r}")
    return kernel_backend


def jl_project(key: jax.Array, witness_flat: jax.Array,
               params: LabradorParams) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One JL attempt: sample ternary Pi per witness index and project.

    witness_flat: (r, n*d) raw residues.  Returns (pi (r,256,n*d) int8,
    projection (256,) int32 over the integers, ok flag).
    (proofgen.rs:429-456; validity check verification.rs:568-579)
    """
    p = params
    keys = jax.random.split(key, p.r)
    pi = jax.vmap(lambda k: sampling.sample_jl_matrix(k, p))(keys)

    # integer matmul: pi (r,256,nd) @ s (r,nd) summed over r, over the
    # *centered* representatives.  For reference-style witnesses (small
    # nonneg coefficients, proofgen.rs:460-518) centering is the identity,
    # so this matches ``Zq::lift_inv`` raw-residue behavior there; for
    # recursion witnesses (centered digits) it recovers the true small
    # integers.  Four signed-int8 limbs keep this on the int8 MXU and make
    # it exact for any int32-centered witness (big-q witnesses exceed the
    # 2-limb range).
    if zq_ops.is_big(p.q):
        w_centered = witness_flat        # big-q convention: already signed
    else:
        w_centered = jnp.where(witness_flat > p.q // 2,
                               witness_flat - p.q, witness_flat)
    pi_flat = jnp.moveaxis(pi, 1, 0).reshape(256, -1)  # (256, r*nd)
    dn = (((1,), (0,)), ((), ()))
    v = w_centered.reshape(-1)
    dots = []
    for _ in range(4):
        limb = ((v + 128) & 255) - 128               # signed int8 range
        dots.append(jax.lax.dot_general(
            pi_flat, limb.astype(jnp.int8)[:, None], dn,
            preferred_element_type=jnp.int32)[:, 0])
        v = (v - limb) >> 8
    # exact p = ((d3*256 + d2)*256 + d1)*256 + d0, recombined in emulated
    # signed-64 (partial recombinations can exceed int32 for rejected draws)
    acc = zq_ops.i64_from_i32(dots[3])
    for k in (2, 1, 0):
        acc = zq_ops.i64_add(zq_ops.i64_shl(acc, 8),
                             zq_ops.i64_from_i32(dots[k]))
    # fits-int32 guard: hi word must be the sign extension of the low word
    fits = jnp.all(acc[0] == (acc[1] >> 31))
    proj = acc[1]
    bound = 128 * p.beta_bound * p.beta_bound
    # per-entry precheck keeps the 256-term sum of squares < 2^64 —
    # sum_sq_u64's exactness contract (see verifier.fs_jl_norm)
    entry_max = min(math.isqrt(bound), 2**31 - 1)
    entries_ok = jnp.all(jnp.abs(proj) <= jnp.int32(entry_max))
    norm_sq = sum_sq_u64(proj)
    ok = fits & entries_ok & u64_leq_const(norm_sq, bound)
    return pi, proj, ok


def _jl_with_retries(key: jax.Array, witness_flat: jax.Array,
                     params: LabradorParams, max_attempts: int = 6):
    """JL projection with the reference's retry-then-give-up behavior
    (<=5 rejections then panic, proofgen.rs:169-181; here: an ok flag the
    host asserts on)."""

    def attempt(i):
        return jl_project(jax.random.fold_in(key, i), witness_flat, params)

    init = attempt(jnp.int32(0)) + (jnp.int32(0),)

    def cond(carry):
        _, _, ok, i = carry
        return (~ok) & (i < max_attempts - 1)

    def body(carry):
        _, _, _, i = carry
        i = i + 1
        pi, proj, ok = attempt(i)
        return pi, proj, ok, i

    pi, proj, ok, _ = jax.lax.while_loop(cond, body, init)
    return pi, proj, ok


def prove_phase1(params: LabradorParams, witness: jax.Array, state: State,
                 crs, oracle, ost,
                 decomp_mode: str = "reference",
                 kernel_backend: str = "auto",
                 ctx: protocol.AxisCtx | None = None):
    """Protocol steps 1-3 (the kappa-heavy commitment phase): Ajtai t,
    Gram g, outer commitment u1.  Returns (ost, carry dict) — the carry is
    a plain pytree, so it is also the phase-checkpoint payload.

    kernel_backend: 'xla' (streamed scans), 'pallas' (fused circulant MXU
    kernel for the Ajtai commitment — 2.9x the XLA path on a v5e chip,
    PERF.md), or 'auto' (pallas on TPU, xla elsewhere; the protocol layer
    additionally falls back to xla for big-q / sharded / reference-parity
    CRS runs where the fused kernel does not apply)."""
    p = params
    plan = ntt_ops.plan_for(p)
    kernel_backend = resolve_backend(kernel_backend)
    s_hat = ntt_ops.ntt_fwd(witness, plan)                # (P, r, n, d)

    # -- step 1: inner Ajtai commitments t_i = A s_i (proofgen.rs:41-49)
    t = protocol.ajtai_commit(crs, s_hat, p, plan,
                              use_pallas=(kernel_backend == "pallas"),
                              ctx=ctx, s_coeff=witness)

    # -- step 2: Gram matrix g_ij = <s_i, s_j> (proofgen.rs:59-70)
    g_hat = protocol.gram_hat(s_hat, plan)
    g = ntt_ops.ntt_inv_modq(g_hat, plan)                 # (r, r, d)

    # -- step 3: outer commitment u1 (proofgen.rs:100-153)
    t_dig = protocol.decompose_t(t, p, decomp_mode)       # (t1, r, kappa, d)
    g_dig = protocol.decompose_g(g, p, decomp_mode)       # (t2, r, r, d)
    u_1 = protocol.u1_from_digits(crs, t_dig, g_dig, p, plan, ctx=ctx,
                                  use_pallas=(kernel_backend == "pallas"))
    return ost, dict(t=t, g=g, u_1=u_1)


def prove_phase2(params: LabradorParams, witness: jax.Array, state: State,
                 crs, oracle, ost, ph1: dict,
                 decomp_mode: str = "reference",
                 kernel_backend: str = "auto",
                 ctx: protocol.AxisCtx | None = None):
    """Protocol steps 4-8: JL projection, both aggregations, h, u2.

    Composition of prove_phase2a (step 4: JL) and prove_phase2b (steps
    5-8) — the checkpointed runner dispatches the halves as separate
    programs (the JL retry graph carries (r, 256, n*d) ternary operands
    that pushed the (128,128) 2^20 shape's phase-2 program over the
    remote AOT compile helper's memory, round 5), while the fused prover
    traces them as one.  kernel_backend as in prove_phase1 (drives the
    fused u2 kernel)."""
    ost, ph2a = prove_phase2a(params, witness, state, crs, oracle, ost, ph1)
    ost, ph2b = prove_phase2b(params, witness, state, crs, oracle, ost,
                              ph1, ph2a, decomp_mode, kernel_backend, ctx)
    return ost, {**ph2a, **ph2b}


def prove_phase2a(params: LabradorParams, witness: jax.Array, state: State,
                  crs, oracle, ost, ph1: dict):
    """Protocol step 4: JL projection with retries (proofgen.rs:161-186)
    plus its transcript absorbs."""
    p = params
    u_1 = ph1["u_1"]
    ost = oracle.absorb(ost, DOM_U1, jax.tree.leaves(u_1))
    witness_flat = witness.reshape(p.r, p.n * p.d)
    pi, proj_int, jl_ok = _jl_with_retries(
        oracle.challenge_key(ost, TAG_JL), witness_flat, p)
    projection = zq_ops.from_signed(proj_int, p.q)        # lift (proofgen.rs:186)
    ost = oracle.absorb(ost, DOM_JL, jax.tree.leaves([pi, projection]))
    return ost, dict(pi=pi, projection=projection, jl_ok=jl_ok)


def prove_phase2b(params: LabradorParams, witness: jax.Array, state: State,
                  crs, oracle, ost, ph1: dict, ph2a: dict,
                  decomp_mode: str = "reference",
                  kernel_backend: str = "auto",
                  ctx: protocol.AxisCtx | None = None):
    """Protocol steps 5-8: both aggregations, h, u2."""
    p = params
    plan = ntt_ops.plan_for(p)
    kernel_backend = resolve_backend(kernel_backend)
    s_hat = ntt_ops.ntt_fwd(witness, plan)
    g, u_1 = ph1["g"], ph1["u_1"]
    pi, projection = ph2a["pi"], ph2a["projection"]

    # -- step 5: first aggregation (proofgen.rs:189-289)
    ub = p.upper_bound
    # small static counts: unrolled loops trace leaner programs than vmap
    # over (hash -> key -> sampler-with-while-loop) chains
    psi = zq_ops.stack([sampling.sample_psi(
        oracle.challenge_key(ost, TAG_PSI, i), p) for i in range(ub)])
    omega = zq_ops.stack([sampling.sample_omega(
        oracle.challenge_key(ost, TAG_OMEGA, i), p) for i in range(ub)])

    a_prime = zq_ops.index(state.a_prime_k, slice(None, p.l_count))
    phi_prime = zq_ops.index(state.phi_prime_k, slice(None, p.l_count))
    a_pp = protocol.aggregate_a_pp(a_prime, psi, p.q, plan)       # (ub,r,r,d)
    pi_sigma = protocol.sigma_inv_pi(pi, p)
    phi_pp = protocol.aggregate_phi_pp(phi_prime, psi, omega, pi_sigma, p,
                                       plan)

    a_pp_hat = ntt_ops.ntt_fwd(a_pp, plan)
    phi_pp_hat = ntt_ops.ntt_fwd(phi_pp, plan)
    # CRT-range invariant: multiply only NTTs of *reduced* tensors — use the
    # transform of the reduced Gram matrix, not the raw eval-domain product.
    g_hat_red = ntt_ops.ntt_fwd(g, plan)
    b_pp = protocol.b_pp_from_witness(a_pp_hat, phi_pp_hat, s_hat,
                                      g_hat_red, plan)            # (ub, d)

    # in-protocol self-check (proofgen.rs:280 -> verification.rs:532-551)
    expected = protocol.b_pp_expected_const(
        omega, psi, projection,
        zq_ops.index(state.b_prime_k, slice(None, p.l_count)), p.q, plan)
    b_pp_ok = zq_ops.all_eq(zq_ops.index(b_pp, (slice(None), 0)), expected)

    # -- step 6: second aggregation challenges (proofgen.rs:295-314)
    ost = oracle.absorb(ost, DOM_BPP, jax.tree.leaves(b_pp))
    alpha = sampling.sample_alpha(oracle.challenge_key(ost, TAG_ALPHA), p)
    beta = sampling.sample_beta(oracle.challenge_key(ost, TAG_BETA), p)
    alpha_hat = ntt_ops.ntt_fwd(alpha, plan)
    beta_hat = ntt_ops.ntt_fwd(beta, plan)
    if hasattr(state, "phi_alpha_modq"):
        # structured recursion state (recursion.FoldedState): the
        # K = k'-sized alpha-contraction streams from the base CRS —
        # the dense (K, r, n, d) phi never exists.
        pp_term = ntt_ops.ntt_inv_modq(
            protocol.phi_weighted_hat(beta_hat, phi_pp_hat, plan), plan)
        phi_fin = zq_ops.add(state.phi_alpha_modq(alpha), pp_term, p.q)
    else:
        phi_hat = ntt_ops.ntt_fwd(state.phi_k, plan)              # (P,K,r,n,d)
        phi_fin_hat = protocol.phi_final_hat(alpha_hat, beta_hat,
                                             phi_hat, phi_pp_hat, plan)
        # reduce mod q between multiplication levels (CRT-range invariant)
        phi_fin = ntt_ops.ntt_inv_modq(phi_fin_hat, plan)         # (r, n, d)
    phi_fin_hat_red = ntt_ops.ntt_fwd(phi_fin, plan)

    # -- step 7: h matrix (proofgen.rs:320-358).  MOD_SUSPENSION + Fermat
    # inverse collapses to one modular scalar multiply by 2^{-1} mod q.
    st = jnp.swapaxes(s_hat, -3, -2)                              # (P,n,r,d)
    m_hat = ntt_ops.eval_matmul(phi_fin_hat_red, st, plan)        # (P,r,r,d)
    m = ntt_ops.ntt_inv_modq(m_hat, plan)
    if zq_ops.is_big(p.q):
        # per-prime: residues of the exact integer (m + m^T) * inv2 < q^2
        # << M, then one Garner fold mod q — no 66-bit mulmod.
        pv = np.asarray(plan.primes)
        m_res = zq_ops.to_res(m, plan.primes)                     # (P,r,r,d)
        inv2_c = np.array([p.inv2 % int(pr) for pr in pv],
                          np.int32).reshape(-1, 1, 1, 1)
        hs = mod_pos(mod_pos(m_res + jnp.swapaxes(m_res, 1, 2), pv) * inv2_c,
                     pv)
        h = zq_ops.fold_res_modq(hs, plan, signed=False)
    else:
        h = mod_pos(mod_pos(m + jnp.swapaxes(m, 0, 1), p.q) * p.inv2, p.q)

    # -- step 8: outer commitment u2 (proofgen.rs:364-378)
    h_dig = protocol.decompose_h(h, p, decomp_mode)
    u_2 = protocol.u2_from_digits(crs, h_dig, p, plan, ctx=ctx,
                                  use_pallas=(kernel_backend == "pallas"))
    return ost, dict(psi=psi, omega=omega, b_prime_prime=b_pp, alpha=alpha,
                     beta=beta, u_2=u_2, b_pp_ok=b_pp_ok, h=h)


def prove_phase3(params: LabradorParams, witness: jax.Array,
                 oracle, ost, ph2: dict):
    """Protocol step 9: amortized opening z = sum_i c_i s_i."""
    p = params
    plan = ntt_ops.plan_for(p)
    s_hat = ntt_ops.ntt_fwd(witness, plan)
    ost = oracle.absorb(ost, DOM_U2, jax.tree.leaves(ph2["u_2"]))
    c = jnp.stack([sampling.sample_challenge(
        oracle.challenge_key(ost, TAG_CHALLENGE, i), p) for i in range(p.r)])
    pv = np.asarray(plan.primes)
    c_hat = ntt_ops.ntt_fwd(c, plan)                              # (P, r, d)
    prod = mod_pos(c_hat[:, :, None, :] * s_hat, pv)              # (P,r,n,d)
    z = ntt_ops.ntt_inv_modq(ntt_ops._mod_sum_p(prod, pv, axis=1),
                             plan)                                # (n, d)
    return dict(c=c, z=z)


def prove_impl(params: LabradorParams, witness: jax.Array, state: State,
               crs, oracle,
               decomp_mode: str = "reference",
               kernel_backend: str = "auto",
               ctx: protocol.AxisCtx | None = None) -> Transcript:
    """Proof generation (unjitted core — compose with vmap/shard_map; use
    ``prove``/``prove_fs`` for the jitted entry points).  `crs` is a CRS
    pytree (traced key, static params) so compiled programs are reused
    across seeds; `oracle` supplies challenges (oracle.py) and absorbs the
    protocol messages in order for the Fiat-Shamir mode.

    ``ctx`` (protocol.AxisCtx) runs the kappa-heavy phases — Ajtai, u1, u2 —
    sharded over a mesh axis: THE single protocol implementation serves
    single-chip, vmapped-batch, and multi-chip execution (the sharded
    prover in parallel/sharded.py is prove_impl under shard_map, not a
    fork).  Everything not kappa-sized is computed replicated per device —
    identical inputs + explicit keys make the replicas bit-identical.

    The body is the composition of three pure phase functions
    (prove_phase1/2/3) with an explicit carried oracle state — the same
    functions the checkpointed/profiled runner (``prove_checkpointed``)
    dispatches separately, so there is no phase-split fork either."""
    kernel_backend = resolve_backend(kernel_backend)
    ost = oracle.init()
    ost, ph1 = prove_phase1(params, witness, state, crs, oracle, ost,
                            decomp_mode, kernel_backend, ctx)
    ost, ph2 = prove_phase2(params, witness, state, crs, oracle, ost, ph1,
                            decomp_mode, kernel_backend, ctx)
    ph3 = prove_phase3(params, witness, oracle, ost, ph2)
    return Transcript(t=ph1["t"], g=ph1["g"], u_1=ph1["u_1"],
                      **ph2, **ph3)


@partial(jax.jit, static_argnames=("params", "decomp_mode", "kernel_backend"))
def prove(params: LabradorParams, witness: jax.Array, state: State,
          crs, verifier_key: jax.Array,
          decomp_mode: str = "reference",
          kernel_backend: str = "auto") -> Transcript:
    """Interactive-model proof: challenges from a verifier PRNG key
    (the reference's interaction model with explicit keys)."""
    return prove_impl(params, witness, state, crs,
                      InteractiveOracle(vkey=verifier_key), decomp_mode,
                      kernel_backend)


@partial(jax.jit, static_argnames=("params", "decomp_mode", "kernel_backend"))
def prove_fs(params: LabradorParams, witness: jax.Array, state: State,
             crs, decomp_mode: str = "reference",
             kernel_backend: str = "auto") -> Transcript:
    """Non-interactive (Fiat-Shamir) proof: challenges derived from a
    SHA-256 running hash of the protocol messages, with the CRS seed,
    parameter set, and statement bound into the initial sponge state
    (FS_SPEC.md).  Completes the reference's unfinished roadmap item
    (README.md:12)."""
    return prove_impl(params, witness, state, crs,
                      FiatShamirOracle.create(crs.key, state, params),
                      decomp_mode, kernel_backend)


@partial(jax.jit, static_argnames=("params", "decomp_mode", "kernel_backend"))
def _jit_phase1(params, witness, state, crs, oracle, ost, decomp_mode,
                kernel_backend):
    return prove_phase1(params, witness, state, crs, oracle, ost,
                        decomp_mode, kernel_backend)


@partial(jax.jit, static_argnames=("params",))
def _jit_phase2a(params, witness, state, crs, oracle, ost, ph1):
    return prove_phase2a(params, witness, state, crs, oracle, ost, ph1)


@partial(jax.jit, static_argnames=("params", "decomp_mode", "kernel_backend"))
def _jit_phase2b(params, witness, state, crs, oracle, ost, ph1, ph2a,
                 decomp_mode, kernel_backend):
    return prove_phase2b(params, witness, state, crs, oracle, ost, ph1,
                         ph2a, decomp_mode, kernel_backend)


@partial(jax.jit, static_argnames=("params",))
def _jit_phase3(params, witness, oracle, ost, ph2):
    return prove_phase3(params, witness, oracle, ost, ph2)


def prove_checkpointed(params: LabradorParams, witness: jax.Array,
                       state: State, crs, verifier_key: jax.Array,
                       ckpt_path: str | None = None,
                       decomp_mode: str = "reference",
                       kernel_backend: str = "auto",
                       timer=None) -> Transcript:
    """Phase-dispatched proving: the SAME prove_phase1/2/3 functions as
    ``prove``, but jitted and executed one phase at a time so that

      * ``ckpt_path`` persists each completed phase's carry pytree — a
        preempted large-witness job (BASELINE config 4) resumes at the last
        phase boundary instead of re-proving from scratch (SURVEY.md §5.4);
      * ``timer`` (utils.profiling.PhaseTimer) records real per-phase
        device times (SURVEY.md §5.1), since each phase is its own dispatch.

    Bit-identical to ``prove`` — the phases ARE the prover.
    """
    from .utils import checkpoint
    from .utils import profiling
    from .utils.profiling import PhaseTimer
    p = params
    kernel_backend = resolve_backend(kernel_backend)
    oracle = InteractiveOracle(vkey=verifier_key)
    timer = timer if timer is not None else PhaseTimer()
    ost = oracle.init()

    ph1 = ph2 = None
    done = 0
    if ckpt_path and checkpoint.exists(ckpt_path):
        meta = checkpoint.load_meta(ckpt_path)
        done = int(meta.get("phases_done", 0))
        tmpl1 = jax.eval_shape(lambda: prove_phase1(
            p, witness, state, crs, oracle, ost, decomp_mode,
            kernel_backend)[1])
        tmpl1 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tmpl1)
        if done >= 1:
            loaded = checkpoint.load(ckpt_path, ost=ost, ph1=tmpl1)
            ost, ph1 = loaded["ost"], loaded["ph1"]
        if done >= 2:
            tmpl2 = jax.eval_shape(lambda: prove_phase2(
                p, witness, state, crs, oracle, ost, tmpl1, decomp_mode,
                kernel_backend)[1])
            tmpl2 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 tmpl2)
            loaded = checkpoint.load(ckpt_path, ost=ost, ph1=tmpl1,
                                     ph2=tmpl2)
            ost, ph1, ph2 = loaded["ost"], loaded["ph1"], loaded["ph2"]

    if done < 1:
        with timer.phase("p1_commitments"):
            ost, ph1 = _jit_phase1(p, witness, state, crs, oracle, ost,
                                   decomp_mode, kernel_backend)
            profiling.wait_for(ph1)
        if ckpt_path:
            checkpoint.save(ckpt_path, meta=dict(phases_done=1),
                            ost=ost, ph1=ph1)
    if done < 2:
        with timer.phase("p2_jl_aggregation_u2"):
            # two programs: the JL retry graph alone (2a) then the
            # aggregations/h/u2 (2b) — keeps each under the remote AOT
            # compile helper's memory at the largest shapes (round 5)
            ost, ph2a = _jit_phase2a(p, witness, state, crs, oracle, ost,
                                     ph1)
            profiling.wait_for(ph2a)
            ost, ph2b = _jit_phase2b(p, witness, state, crs, oracle, ost,
                                     ph1, ph2a, decomp_mode, kernel_backend)
            profiling.wait_for(ph2b)
            ph2 = {**ph2a, **ph2b}
        if ckpt_path:
            checkpoint.save(ckpt_path, meta=dict(phases_done=2),
                            ost=ost, ph1=ph1, ph2=ph2)
    with timer.phase("p3_opening"):
        ph3 = _jit_phase3(p, witness, oracle, ost, ph2)
        profiling.wait_for(ph3)
    return Transcript(t=ph1["t"], g=ph1["g"], u_1=ph1["u_1"], **ph2, **ph3)
