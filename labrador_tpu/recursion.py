"""Recursive proof composition: fold verification into a new LaBRADOR instance.

The reference ships only a non-compiling sketch (``src/recursion.rs:11-33``,
not even in lib.rs) with the size formulas r' = 2*nu + mu,
n' = max(ceil(n/nu), ceil(m/mu)), k' = kappa + kappa_1 + kappa_2 + 3, while
README.md:11 claims recursion as a capability.  This module implements it:
the verifier's algebraic checks become a *new principal relation* whose
witness is the digit decomposition of the amortized opening, and the same
prover pipeline runs on it.

Construction (LaBRADOR §6, adapted to this framework's conventions):

  new witness  = exact centered base-digit decompositions of z, t, g, h
                 (so the base proof must be generated with
                 ``decomp_mode='exact'`` on ``exact_digits=True`` params —
                 the reference's lossy ``centered_rep`` digits cannot be
                 recomposed and therefore cannot be folded).
  vectors      = nz z-digit vectors (nu = 1 piece each, rank n) followed by
                 mu "garbage" vectors holding the t/g/h digit stream,
                 all padded to rank n'.
  k' families  = kappa   rows of   A z = sum_i c_i t_i            (linear)
               + kappa_1 rows of   u1 = sum B t_dig + sum C g_dig (linear)
               + kappa_2 rows of   u2 = sum D h_dig               (linear)
               + <z,z> = sum g c c                                (quadratic)
               + sum <phi_i,z> c_i = sum h c c                    (linear)
               + sum a g + sum h_ii = b                           (linear)

Norm bookkeeping: the new instance carries ``beta_override`` equal to the
actual digit-stream norm (the recursion tracks norm bounds explicitly
instead of re-deriving beta from q — the reference's beta(q) formula is far
below any digit-stream norm at q = 8191; truly norm-tight recursion needs
the large-q limb path, tracked as future work).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .params import LabradorParams, _ceil_log
from .ops import ntt as ntt_ops
from .ops import zq as zq_ops
from .ops.modmath import mod_pos
from . import protocol
from .structs import State, Transcript


def _centered(x, q):
    if isinstance(x, zq_ops.Zq2):
        return zq_ops.to_signed_small(x, q)
    if zq_ops.is_big(q):
        return x            # big-q small-tensor convention: already signed
    return jnp.where(x > q // 2, x - q, x)


def _exact_digits_lifted(x: jax.Array, base: int, ndig: int, q: int) -> jax.Array:
    """Exact centered digits of the centered representative, lifted to
    residues mod q.  Reconstruction sum_k base^k dig_k == x (mod q).
    Identical to protocol._decompose_protocol(mode='exact') — the digits the
    prover committed to in u1/u2."""
    return protocol._decompose_protocol(x, base, ndig, q, "exact")


def _const_poly(val: int, d: int) -> np.ndarray:
    out = np.zeros((d,), np.int32)
    out[0] = val
    return out


@dataclass(frozen=True)
class RecursionLayout:
    """Index bookkeeping for the new witness."""

    params: LabradorParams        # base params
    nz: int                       # z digit count: ceil_log_b(q) exact digits
    mu: int
    n_new: int
    r_new: int
    garbage_len: int              # ring elements in the t/g/h stream
    k_new: int

    @property
    def m_total(self) -> int:
        return self.r_new * self.n_new

    # flat positions ------------------------------------------------------
    def z_pos(self, k: int, l: int) -> int:
        return k * self.n_new + l

    def garbage_pos(self, g_idx: int) -> int:
        return self.nz * self.n_new + g_idx

    # garbage stream order: t digits (i, k, row), then g digits (i<=j, k),
    # then h digits (i<=j, k)
    def t_pos(self, i: int, k: int, row: int) -> int:
        p = self.params
        return self.garbage_pos((i * p.t_1 + k) * p.kappa + row)

    def _tri_base(self) -> int:
        p = self.params
        return p.r * p.t_1 * p.kappa

    def g_pos(self, i: int, j: int, k: int) -> int:
        p = self.params
        tri = i * p.r - i * (i - 1) // 2 + (j - i)  # index of (i,j), i<=j
        return self.garbage_pos(self._tri_base() + tri * p.t_2 + k)

    def h_pos(self, i: int, j: int, k: int) -> int:
        p = self.params
        n_tri = p.r * (p.r + 1) // 2
        tri = i * p.r - i * (i - 1) // 2 + (j - i)
        return self.garbage_pos(self._tri_base() + n_tri * p.t_2
                                + tri * p.t_1 + k)


def make_layout(params: LabradorParams, mu: int = 0) -> RecursionLayout:
    p = params
    assert p.exact_digits, "recursion requires exact_digits=True base params"
    nz = _ceil_log(p.q, p.b)  # z digits: base b, enough to cover Zq exactly
    n_tri = p.r * (p.r + 1) // 2
    garbage = p.r * p.t_1 * p.kappa + n_tri * p.t_2 + n_tri * p.t_1
    if mu <= 0:
        # balance: n' ~ sqrt(garbage) (the recursion.rs:13-18 sketch leaves
        # nu/mu selection open; nu is fixed at 1 here)
        mu = max(1, int(round(math.sqrt(garbage))))
    n_new = max(p.n, -(-garbage // mu))
    r_new = nz + mu
    k_new = p.kappa + p.kappa_1 + p.kappa_2 + 3
    return RecursionLayout(params=p, nz=nz, mu=mu, n_new=n_new, r_new=r_new,
                           garbage_len=garbage, k_new=k_new)


def build_witness(layout: RecursionLayout, proof: Transcript) -> jax.Array:
    """(r_new, n_new, d) new witness: lifted exact centered digits."""
    p = layout.params
    q, d = p.q, p.d
    z_dig = _exact_digits_lifted(proof.z, p.b, layout.nz, q)   # (nz, n, d)
    # (nz = ceil_log_b(q) so the centered z digits reconstruct exactly)
    t_dig = _exact_digits_lifted(proof.t, p.b_1, p.t_1, q)     # (t1,r,kap,d)
    g_dig = _exact_digits_lifted(proof.g, p.b_2, p.t_2, q)     # (t2,r,r,d)
    h_dig = _exact_digits_lifted(proof.h, p.b_1, p.t_1, q)     # (t1,r,r,d)

    flat = jnp.zeros((layout.m_total, d), jnp.int32)
    # z vectors
    for k in range(layout.nz):
        flat = flat.at[layout.z_pos(k, 0): layout.z_pos(k, 0) + p.n].set(
            z_dig[k])
    # garbage stream, in layout order
    stream = [jnp.transpose(t_dig, (1, 0, 2, 3)).reshape(-1, d)]  # (i,k,row)
    tri_g, tri_h = [], []
    for i in range(p.r):
        for j in range(i, p.r):
            tri_g.append(g_dig[:, i, j, :])     # (t2, d)
            tri_h.append(h_dig[:, i, j, :])     # (t1, d)
    stream.append(jnp.concatenate(tri_g, axis=0))
    stream.append(jnp.concatenate(tri_h, axis=0))
    garbage = jnp.concatenate(stream, axis=0)
    assert garbage.shape[0] == layout.garbage_len
    flat = flat.at[layout.garbage_pos(0):
                   layout.garbage_pos(0) + layout.garbage_len].set(garbage)
    return flat.reshape(layout.r_new, layout.n_new, d)


def _canonical_aggregates(params: LabradorParams, state: State,
                          proof: Transcript):
    """Verifier lines 3-7: canonical a_ij, phi_i, b from the transcript
    (all reduced mod q) — shared with verifier.verify_report."""
    p = params
    plan = ntt_ops.plan_for(p)
    a_prime = zq_ops.index(state.a_prime_k, slice(None, p.l_count))
    phi_prime = zq_ops.index(state.phi_prime_k, slice(None, p.l_count))
    a_pp = protocol.aggregate_a_pp(a_prime, proof.psi, p.q, plan)
    pi_sigma = protocol.sigma_inv_pi(proof.pi, p)
    phi_pp = protocol.aggregate_phi_pp(phi_prime, proof.psi, proof.omega,
                                       pi_sigma, p, plan)
    alpha_hat = ntt_ops.ntt_fwd(proof.alpha, plan)
    beta_hat = ntt_ops.ntt_fwd(proof.beta, plan)
    a_fin = ntt_ops.ntt_inv_modq(protocol.a_final_hat(
        alpha_hat, beta_hat, ntt_ops.ntt_fwd(state.a_k, plan),
        ntt_ops.ntt_fwd(a_pp, plan), plan), plan)
    phi_fin = ntt_ops.ntt_inv_modq(protocol.phi_final_hat(
        alpha_hat, beta_hat, ntt_ops.ntt_fwd(state.phi_k, plan),
        ntt_ops.ntt_fwd(phi_pp, plan), plan), plan)
    b_fin = protocol.b_final(alpha_hat, beta_hat,
                             ntt_ops.ntt_fwd(state.b_k, plan),
                             ntt_ops.ntt_fwd(proof.b_prime_prime, plan), plan)
    return a_fin, phi_fin, b_fin


def _ring_mul(a, b, plan):
    return ntt_ops.negacyclic_polymul(a, b, plan)


def build_relation(layout: RecursionLayout, state: State, proof: Transcript,
                   crs):
    """Constraint families (a_new, phi_new, b_new) over the new witness.

    a_new:   (k', r_new, r_new, d)  — only the <z,z> family is nonzero.
    phi_new: (k', r_new, n_new, d)
    b_new:   (k', d)

    Everything here is derivable from public data (state, transcript, CRS),
    so the recursive verifier can rebuild the same relation.

    The tensors are assembled in per-prime CRT residue form and folded to
    canonical residues once at the end — this makes every scalar scaling a
    cheap int32 lane op and works identically at small and 2^32-scale q
    (where entries like ``a_fin * b2^k mod q`` would need 66-bit products).
    """
    p = layout.params
    q, d = p.q, p.d
    plan = ntt_ops.plan_for(p)
    primes = plan.primes
    P = len(primes)
    kp = layout.k_new
    M = layout.m_total

    phi = jnp.zeros((P, kp, M, d), jnp.int32)
    b_new = jnp.zeros((P, kp, d), jnp.int32)
    a_new = jnp.zeros((P, kp, layout.r_new, layout.r_new, d), jnp.int32)

    a_fin, phi_fin, b_fin = _canonical_aggregates(p, state, proof)
    c = proof.c                                       # (r, d)
    c_hat = ntt_ops.ntt_fwd(c, plan)

    # base-power constants (mod q)
    bpow = [pow(p.b, k, q) for k in range(layout.nz)]
    b1pow = [pow(p.b_1, k, q) for k in range(p.t_1)]
    b2pow = [pow(p.b_2, k, q) for k in range(p.t_2)]

    def res_of(x):
        """Canonical ZqT / signed small -> (P, ...) residues."""
        return zq_ops.to_res(x, primes)

    def const_res(v: int):
        return [v % pr for pr in primes]

    # ---- group 1: kappa rows of  A z - sum_i c_i t_i = 0 -----------------
    a_res = res_of(crs.a_rows())                      # (P, kappa, n, d)
    row0 = 0
    for k in range(layout.nz):
        # phi on z_k[l] = b^k * A[rho, l]
        ck = const_res(bpow[k])
        blk = jnp.stack([mod_pos(a_res[pi_] * ck[pi_], pr)
                         for pi_, pr in enumerate(primes)])
        phi = phi.at[:, row0:row0 + p.kappa,
                     layout.z_pos(k, 0):layout.z_pos(k, 0) + p.n, :].set(blk)
    # phi on t_dig(i, k2, row=rho) = -c_i * b1^k2   (only its own row rho)
    c_res = res_of(c)                                 # (P, r, d)
    for i in range(p.r):
        for k2 in range(p.t_1):
            ck = const_res(b1pow[k2])
            coeff = jnp.stack([mod_pos(-c_res[pi_, i] * ck[pi_], pr)
                               for pi_, pr in enumerate(primes)])  # (P, d)
            pos0 = layout.t_pos(i, k2, 0)
            rows = jnp.arange(p.kappa)
            phi = phi.at[:, row0 + rows, pos0 + rows, :].set(
                jnp.broadcast_to(coeff[:, None, :], (P, p.kappa, d)))
    # b = 0 for these rows

    # ---- group 2: kappa_1 rows of  u1 = sum B t + sum C g ----------------
    row1 = p.kappa
    for i in range(p.r):
        for k in range(p.t_1):
            b_ik = res_of(crs.b_rows(i, k))           # (P, kappa_1, kappa, d)
            pos0 = layout.t_pos(i, k, 0)
            phi = phi.at[:, row1:row1 + p.kappa_1,
                         pos0:pos0 + p.kappa, :].set(b_ik)
    for i in range(p.r):
        for j in range(i, p.r):
            for k in range(p.t_2):
                c_ijk = res_of(crs.c_vec(i, j, k))    # (P, kappa_2, d)
                pos = layout.g_pos(i, j, k)
                phi = phi.at[:, row1:row1 + p.kappa_1, pos, :].set(c_ijk)
    b_new = b_new.at[:, row1:row1 + p.kappa_1].set(res_of(proof.u_1))

    # ---- group 3: kappa_2 rows of  u2 = sum D h --------------------------
    row2 = row1 + p.kappa_1
    for i in range(p.r):
        for j in range(i, p.r):
            for k in range(p.t_1):
                d_ijk = res_of(crs.d_vec(i, j, k))
                pos = layout.h_pos(i, j, k)
                phi = phi.at[:, row2:row2 + p.kappa_2, pos, :].set(d_ijk)
    b_new = b_new.at[:, row2:row2 + p.kappa_2].set(res_of(proof.u_2))

    # ---- family 16: <z,z> - sum_ij g_ij c_i c_j = 0 ----------------------
    f16 = row2 + p.kappa_2
    for k in range(layout.nz):
        for k2 in range(layout.nz):
            val = (bpow[k] * bpow[k2]) % q
            a_new = a_new.at[:, f16, k, k2, 0].set(
                jnp.asarray(const_res(val), jnp.int32))
    cc_res = {}
    for i in range(p.r):
        for j in range(p.r):
            prod = ntt_ops.ntt_inv_modq(
                ntt_ops.eval_mul(c_hat[:, i:i + 1, :], c_hat[:, j:j + 1, :],
                                 plan), plan)
            cc_res[(i, j)] = res_of(zq_ops.index(prod, 0))   # (P, d)
    for i in range(p.r):
        for j in range(i, p.r):
            mult = 1 if i == j else 2
            for k in range(p.t_2):
                ck = const_res(mult * b2pow[k] % q)
                coeff = jnp.stack([
                    mod_pos(-cc_res[(i, j)][pi_] * ck[pi_], pr)
                    for pi_, pr in enumerate(primes)])
                phi = phi.at[:, f16, layout.g_pos(i, j, k), :].set(coeff)

    # ---- family 17: sum_i <phi_i, z> c_i - sum h c c = 0 -----------------
    f17 = f16 + 1
    # sum_i c_i (x) phi_fin_i : (n, d) ring elements
    phi_fin_hat = ntt_ops.ntt_fwd(phi_fin, plan)      # (P, r, n, d)
    terms = []
    for pi_, pr in enumerate(primes):
        s = ntt_ops._mod_sum(
            mod_pos(c_hat[pi_][:, None, :] * phi_fin_hat[pi_], pr),
            pr, axis=0)                               # (n, d)
        terms.append(s)
    cphi_res = res_of(ntt_ops.ntt_inv_modq(jnp.stack(terms), plan))  # (P,n,d)
    for k in range(layout.nz):
        ck = const_res(bpow[k])
        blk = jnp.stack([mod_pos(cphi_res[pi_] * ck[pi_], pr)
                         for pi_, pr in enumerate(primes)])
        phi = phi.at[:, f17,
                     layout.z_pos(k, 0):layout.z_pos(k, 0) + p.n, :].set(blk)
    for i in range(p.r):
        for j in range(i, p.r):
            mult = 1 if i == j else 2
            for k in range(p.t_1):
                ck = const_res(mult * b1pow[k] % q)
                coeff = jnp.stack([
                    mod_pos(-cc_res[(i, j)][pi_] * ck[pi_], pr)
                    for pi_, pr in enumerate(primes)])
                phi = phi.at[:, f17, layout.h_pos(i, j, k), :].set(coeff)

    # ---- family 18: sum a_ij g_ij + sum h_ii = b -------------------------
    f18 = f17 + 1
    a_fin_res = res_of(a_fin)                         # (P, r, r, d)
    for i in range(p.r):
        for j in range(i, p.r):
            mult = 1 if i == j else 2
            for k in range(p.t_2):
                ck = const_res(mult * b2pow[k] % q)
                coeff = jnp.stack([
                    mod_pos(a_fin_res[pi_, i, j] * ck[pi_], pr)
                    for pi_, pr in enumerate(primes)])
                phi = phi.at[:, f18, layout.g_pos(i, j, k), :].set(coeff)
    for i in range(p.r):
        for k in range(p.t_1):
            phi = phi.at[:, f18, layout.h_pos(i, i, k), 0].set(
                jnp.asarray(const_res(b1pow[k]), jnp.int32))
    b_new = b_new.at[:, f18].set(res_of(b_fin))

    # fold the residue-form tensors to canonical mod-q form (every entry is
    # the residue of one integer with |value| < q^2 << M/2: exact.  signed —
    # the -c_i b1^k / -cc b^k coefficients are negative integers)
    a_new_q = zq_ops.fold_res_modq(a_new, plan, signed=True)
    phi_q = zq_ops.fold_res_modq(phi, plan, signed=True)
    b_q = zq_ops.fold_res_modq(b_new, plan, signed=True)
    phi_q = zq_ops.reshape(phi_q, (kp, layout.r_new, layout.n_new, d))
    return a_new_q, phi_q, b_q


def relation_residual(a_k: jax.Array, phi_k: jax.Array, b_k: jax.Array,
                      witness: jax.Array, params_new: LabradorParams) -> jax.Array:
    """max |sum_ij a <w_i,w_j> + sum <phi_i, w_i> - b| over all families —
    0 iff the new witness satisfies the new relation."""
    plan = ntt_ops.plan_for(params_new)
    q = params_new.q
    w_hat = ntt_ops.ntt_fwd(witness, plan)
    g_hat = protocol.gram_hat(w_hat, plan)
    g = ntt_ops.ntt_inv_modq(g_hat, plan)
    g_hat_red = ntt_ops.ntt_fwd(g, plan)
    a_hat = ntt_ops.ntt_fwd(a_k, plan)
    phi_hat = ntt_ops.ntt_fwd(phi_k, plan)
    K = a_k.shape[0]
    outs = []
    for pi_, pr in enumerate(plan.primes):
        t1 = ntt_ops._mod_sum(
            mod_pos(a_hat[pi_] * g_hat_red[pi_][None], pr).reshape(K, -1, params_new.d),
            pr, axis=1)
        t2 = ntt_ops._mod_sum(
            mod_pos(phi_hat[pi_] * w_hat[pi_][None], pr).reshape(K, -1, params_new.d),
            pr, axis=1)
        outs.append(mod_pos(t1 + t2, pr))
    lhs = ntt_ops.ntt_inv_modq(jnp.stack(outs), plan)   # (K, d)
    diff = zq_ops.sub(lhs, b_k, q)                       # 0 iff equal
    if isinstance(diff, zq_ops.Zq2):
        return jnp.max(jnp.maximum(jnp.abs(diff.hi), jnp.abs(diff.lo)))
    return jnp.max(diff)


def recursive_step(params: LabradorParams, state: State, proof: Transcript,
                   crs, mu: int = 0, kappa_new: int = 16):
    """Fold a (base) proof into a new LaBRADOR instance.

    Returns (params_new, witness_new, state_new, layout).  The caller runs
    the standard ``prover.prove``/``verifier.verify_report`` on the result
    (BASELINE.json config 5).
    """
    p = params
    layout = make_layout(p, mu)
    witness = build_witness(layout, proof)
    a_new, phi_new, b_new = build_relation(layout, state, proof, crs)

    # actual norm bound of the digit witness (centered)
    wc = np.asarray(_centered(witness, p.q))
    beta_new = int(math.isqrt(int((wc.astype(np.int64) ** 2).sum()))) + 1

    params_new = LabradorParams(
        n=layout.n_new, r=layout.r_new, q=p.q, d=p.d,
        k_count=layout.k_new, l_count=1,
        kappa_override=kappa_new, exact_digits=True,
        beta_override=beta_new)

    state_new = State(
        a_k=a_new, phi_k=phi_new, b_k=b_new,
        a_prime_k=a_new, phi_prime_k=phi_new,
        b_prime_k=zq_ops.index(b_new, (slice(None), 0)))
    return params_new, witness, state_new, layout
