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

Norm bookkeeping: the new instance carries ``beta_override`` equal to
sqrt(2) times the actual digit-stream norm (the recursion tracks norm
bounds explicitly instead of re-deriving beta from q — the reference's
beta(q) formula is far below any digit-stream norm at q = 8191; at the
2^32-scale modulus the folded instance IS norm-tight, see
tests/test_bigq_recursion.py).  The sqrt(2) headroom keeps the JL validity
bound 128*beta^2 clear of the projection's expectation 128*||w||^2.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

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


def _canonical_aggregates(params: LabradorParams, state,
                          proof: Transcript):
    """Verifier lines 3-7: canonical a_ij, phi_i, b from the transcript
    (all reduced mod q) — shared with verifier.verify_report.  Accepts a
    dense ``structs.State`` or a structured ``FoldedState`` (whose
    alpha-contractions stream from the base CRS — enables multi-level
    folding without ever materializing a dense relation)."""
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
    if hasattr(state, "phi_alpha_modq"):
        a_beta = ntt_ops.ntt_inv_modq(protocol.phi_weighted_hat(
            beta_hat, ntt_ops.ntt_fwd(a_pp, plan), plan), plan)
        a_fin = zq_ops.add(state.a_alpha_modq(proof.alpha), a_beta, p.q)
        phi_beta = ntt_ops.ntt_inv_modq(protocol.phi_weighted_hat(
            beta_hat, ntt_ops.ntt_fwd(phi_pp, plan), plan), plan)
        phi_fin = zq_ops.add(state.phi_alpha_modq(proof.alpha), phi_beta,
                             p.q)
    else:
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


# ---------------------------------------------------------------------------
# Structured folded relation: stream the CRS-derived phi blocks instead of
# materializing the dense (k', M, d) tensor (which is ~kappa x larger than
# the CRS itself and cannot scale past toy kappa).  The k'-contraction the
# protocol actually needs — phi_final = sum_k alpha_k phi_k — is computed
# directly from the base CRS with the same streaming kernels the prover
# uses, in O(M d) memory.
# ---------------------------------------------------------------------------

def _scale_modq(x, const: int, plan, q: int):
    """x * const mod q for canonical tensors (int32 small q / Zq2 big q).
    Exact: the integer x*const < q^2 << M fits one residue fold."""
    const = int(const) % q
    if not zq_ops.is_big(q):
        return mod_pos(x * const, q)
    res = zq_ops.to_res(x, plan.primes)
    outs = [mod_pos(res[pi] * (const % pr), pr)
            for pi, pr in enumerate(plan.primes)]
    return zq_ops.fold_res_modq(jnp.stack(outs), plan, signed=False)


def _ring_mul_modq(a, b, plan):
    return ntt_ops.negacyclic_polymul(a, b, plan)


def _scale_many_modq(x, w: np.ndarray, plan, q: int):
    """x (..., d) canonical x STATIC integer weight table w (numpy object/
    int array broadcastable against x.shape[:-1]) -> canonical mod q.

    One vectorized reduction for a whole weight table — replaces the
    per-(i, j, k) `_scale_modq` unrolls whose ~1000 dynamic-update-slice
    subgraphs made the folded-instance prover OOM the remote AOT compile
    helper (round 5)."""
    w = np.vectorize(lambda v: int(v) % q, otypes=[object])(np.asarray(w))
    if not zq_ops.is_big(q):
        w32 = jnp.asarray(w.astype(np.int64), jnp.int32)[..., None]
        return mod_pos(x * w32, q)
    res = zq_ops.to_res(x, plan.primes)                 # (P, ..., d)
    wr = np.stack([np.vectorize(lambda v: int(v) % int(pr),
                                otypes=[np.int64])(w)
                   for pr in plan.primes]).astype(np.int32)  # (P, ...)
    pv = np.asarray(plan.primes)
    bshape = (wr.shape[0],) + (1,) * (res.ndim - 2 - w.ndim) + w.shape + (1,)
    out = mod_pos(res * jnp.asarray(wr).reshape(bshape), pv)
    return zq_ops.fold_res_modq(out, plan, signed=False)


def _contract_rows_hat(w_hat: jax.Array, m_hat: jax.Array, plan) -> jax.Array:
    """sum_rho w[rho] * M[rho, col] in eval domain.
    w_hat: (P, R, d); m_hat: (P, R, C, d)  ->  (P, C, d)."""
    out = ntt_ops.eval_matmul(w_hat[:, None, :, :], m_hat, plan)
    return out[:, 0]


def _alpha_contract_a(crs, w_hat: jax.Array, p0: LabradorParams, plan):
    """sum_rho w_rho * A[rho]  ->  (n, d) mod q, streaming A row tiles."""
    tile = min(p0.kappa, protocol.AJTAI_ROW_TILE)
    while p0.kappa % tile:
        tile -= 1
    n_tiles = p0.kappa // tile
    P = len(plan.primes)

    def body(acc, i):
        a_blk = crs.a_rows_dyn(i * tile, tile)              # (tile, n, d)
        a_hat = ntt_ops.ntt_fwd(a_blk, plan)
        w_blk = jax.lax.dynamic_slice_in_dim(w_hat, i * tile, tile, axis=1)
        return protocol._eval_add(
            acc, _contract_rows_hat(w_blk, a_hat, plan), plan), None

    acc0 = jnp.zeros((P, p0.n, p0.d), jnp.int32)
    if n_tiles == 1:
        acc, _ = body(acc0, jnp.int32(0))
    else:
        acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_tiles))
    return ntt_ops.ntt_inv_modq(acc, plan)


def _alpha_contract_b(crs, w_hat: jax.Array, p0: LabradorParams, plan):
    """S_B[m] = sum_rho w_rho * B_m[rho, col] for all m = i*t_1 + k
    ->  (r*t_1, kappa, d) mod q, streaming whole-or-column-tiled B blocks."""
    m_total = p0.r * p0.t_1
    # column tile so each step's B block stays within the step budget
    ncb = 1
    while (p0.kappa // ncb) * p0.kappa_1 * p0.d > protocol.U1_STEP_COEFFS \
            or p0.kappa % ncb:
        ncb += 1
        if ncb > p0.kappa:
            ncb = p0.kappa
            break
    cols = p0.kappa // ncb

    def body(_, s):
        m = s // ncb
        cb = s % ncb
        b_blk = crs.b_mat_dyn(m, col0=cb * cols, ncols=cols)  # (k1, cols, d)
        b_hat = ntt_ops.ntt_fwd(b_blk, plan)
        return None, _contract_rows_hat(w_hat, b_hat, plan)   # (P, cols, d)

    _, tiles = jax.lax.scan(body, None, jnp.arange(m_total * ncb))
    # tiles: (steps, P, cols, d) -> (P, m_total, kappa, d)
    acc = jnp.moveaxis(tiles, 1, 0).reshape(
        len(plan.primes), m_total, p0.kappa, p0.d)
    return zq_ops.reshape(ntt_ops.ntt_inv_modq(acc, plan),
                          (p0.r, p0.t_1, p0.kappa, p0.d))


def _alpha_contract_cd(crs, base: int, w_hat: jax.Array, t_used: int,
                       p0: LabradorParams, plan):
    """S[tri, k] = <w, M_{tri,k}> over the kappa_2 rows of the C/D column
    vectors at offset (k + t_1*tri)*kappa_2*d from `base` (the t_1-stride
    quirk layout, structs.rs:106)  ->  (n_tri, t_used, d) mod q."""
    p = p0
    n_tri = p.r * (p.r + 1) // 2
    grp = crs._expand_dyn(
        base, 0, p.t_1 * p.kappa_2 * p.d,
        (n_tri, t_used, p.kappa_2, p.d),
        (p.t_1 * p.kappa_2 * p.d, p.kappa_2 * p.d, p.d, 1))
    m = n_tri * t_used
    mats_hat = ntt_ops.ntt_fwd(zq_ops.reshape(grp, (m, p.kappa_2, p.d)),
                               plan)                        # (P, m, k2, d)
    out = ntt_ops.eval_matmul(mats_hat, w_hat[:, :, None, :], plan)[:, :, 0]
    return zq_ops.reshape(ntt_ops.ntt_inv_modq(out, plan),
                          (n_tri, t_used, p.d))


@struct.dataclass
class FoldedState:
    """The folded principal relation in structured form.

    Drop-in replacement for ``structs.State`` in the prover/verifier: the
    dense (k', M, d) phi tensor never exists.  Instead the CRS-derived
    blocks (A/B/C/D — exactly the base instance's commitment matrices) are
    re-streamed from ``base_crs`` whenever the protocol needs the
    alpha-contraction sum_k alpha_k phi_k, and the handful of
    transcript-derived blocks (challenge products, canonical aggregates)
    are carried as small tensors.  Reference context: ``recursion.rs:13-18``
    sketches only the sizes; the relation layout is build_relation's,
    verified block-for-block equivalent in tests/test_recursion.py.
    """

    base_crs: object            # CRS pytree of the *base* instance
    c: jax.Array                # (r, d) amortized-opening challenges
    cc: jax.Array               # (r, r, d) c_i * c_j mod q
    cphi: jax.Array             # (n, d) sum_i c_i * phi_fin_i mod q
    a_fin: jax.Array            # (r, r, d) canonical aggregate a
    phi0: jax.Array             # (1, r', n', d) dense family-0 row (F')
    b_k: jax.Array              # (k', d) right-hand sides
    layout: RecursionLayout = struct.field(pytree_node=False)

    # --- State-compatible surface ----------------------------------------
    @property
    def q(self) -> int:
        return self.layout.params.q

    @property
    def a_prime_k(self):
        lay = self.layout
        return zq_ops.zeros((1, lay.r_new, lay.r_new, lay.params.d), self.q)

    @property
    def phi_prime_k(self):
        return self.phi0

    @property
    def b_prime_k(self):
        # family 0 is a group-A row: b = 0, and F' takes the constant term
        return zq_ops.index(self.b_k, (slice(0, 1), 0))

    # --- structured contractions ------------------------------------------
    def _base_plan(self):
        return ntt_ops.plan_for(self.layout.params)

    def _alpha_split(self, alpha):
        p0 = self.layout.params
        k0, k1 = p0.kappa, p0.kappa_1
        aA = zq_ops.index(alpha, slice(0, k0))
        aB = zq_ops.index(alpha, slice(k0, k0 + k1))
        aC = zq_ops.index(alpha, slice(k0 + k1, k0 + k1 + p0.kappa_2))
        base = k0 + k1 + p0.kappa_2
        a16 = zq_ops.index(alpha, base)
        a17 = zq_ops.index(alpha, base + 1)
        a18 = zq_ops.index(alpha, base + 2)
        return aA, aB, aC, a16, a17, a18

    def phi_alpha_modq(self, alpha):
        """sum_k alpha_k phi_k  ->  (r', n', d) canonical mod q.

        Streams the base CRS (one A pass, one B pass, one batched C/D
        expansion) — the structured replacement for
        phi_weighted_hat(alpha_hat, ntt_fwd(dense phi)).
        """
        lay = self.layout
        p0 = lay.params
        q, d = p0.q, p0.d
        plan = self._base_plan()
        aA, aB, aC, a16, a17, a18 = self._alpha_split(alpha)
        aA_hat = ntt_ops.ntt_fwd(aA, plan)
        aB_hat = ntt_ops.ntt_fwd(aB, plan)
        aC_hat = ntt_ops.ntt_fwd(aC, plan)
        c_hat = ntt_ops.ntt_fwd(self.c, plan)

        bpow = [pow(p0.b, k, q) for k in range(lay.nz)]
        b1pow = [pow(p0.b_1, k, q) for k in range(p0.t_1)]
        b2pow = [pow(p0.b_2, k, q) for k in range(p0.t_2)]

        flat = zq_ops.zeros((lay.m_total, d), q)

        def setblk(out, sl, val):
            return zq_ops.tmap(lambda o, v: o.at[sl].set(v), out, val)

        # -- z blocks: bpow_k * (sum_rho aA_rho A[rho]  +  a17 * cphi)
        s_a = _alpha_contract_a(self.base_crs, aA_hat, p0, plan)   # (n, d)
        zc = zq_ops.add(s_a, _ring_mul_modq(a17, self.cphi, plan), q)
        for k in range(lay.nz):
            pos = lay.z_pos(k, 0)
            flat = setblk(flat, slice(pos, pos + p0.n),
                          _scale_modq(zc, bpow[k], plan, q))

        # -- t digit blocks: S_B[i,k2,col]  -  b1pow_k2 * (aA_col * c_i)
        s_b = _alpha_contract_b(self.base_crs, aB_hat, p0, plan)
        ac_hat = ntt_ops.eval_mul(aA_hat[:, :, None, :],
                                  c_hat[:, None, :, :], plan)  # (P,kap,r,d)
        ac = ntt_ops.ntt_inv_modq(ac_hat, plan)                # (kap, r, d)
        ac_t = zq_ops.swapaxes(ac, 0, 1)                       # (r, kap, d)
        t_parts = []
        for k2 in range(p0.t_1):
            blk = zq_ops.sub(zq_ops.index(s_b, (slice(None), k2)),
                             _scale_modq(ac_t, b1pow[k2], plan, q), q)
            t_parts.append(blk)                                # (r, kap, d)
        t_blk = zq_ops.swapaxes(zq_ops.stack(t_parts, axis=0), 0, 1)
        g0 = lay.garbage_pos(0)
        t_len = p0.r * p0.t_1 * p0.kappa
        flat = setblk(flat, slice(g0, g0 + t_len),
                      zq_ops.reshape(t_blk, (t_len, d)))

        # -- g digit blocks: <aB, C_tri,k>
        #      + (mult*b2pow_k) * (a18*a_fin_ij - a16*cc_ij)
        s_c = _alpha_contract_cd(self.base_crs, self.base_crs._off_c,
                                 aB_hat, p0.t_2, p0, plan)
        g_base = _ring_mul_modq(a18, self.a_fin, plan)         # (r, r, d)
        g_base = zq_ops.sub(g_base, _ring_mul_modq(a16, self.cc, plan), q)
        # -- h digit blocks: <aC, D_tri,k> - (mult*b1pow_k) * (a17*cc_ij)
        #      + (i==j) b1pow_k * a18
        s_d = _alpha_contract_cd(self.base_crs, self.base_crs._off_d,
                                 aC_hat, p0.t_1, p0, plan)
        h_base = zq_ops.sub(zq_ops.zeros((p0.r, p0.r, d), q),
                            _ring_mul_modq(a17, self.cc, plan), q)
        # whole-triangle vectorized (round 5): the former per-(i, j, k)
        # loop emitted ~tri*(t_1+t_2) dynamic-update-slice subgraphs —
        # ~1000 at r=16 — which OOM-killed the remote AOT compile helper
        # for every kappa=256-base folded instance.  The g/h layout is
        # contiguous (tri-major, digit-minor), so each section is ONE
        # batched scale-add and ONE slice write.
        iu, ju = np.triu_indices(p0.r)
        n_tri = iu.shape[0]
        mult = np.where(iu == ju, 1, 2).astype(object)
        wg = mult[:, None] * np.asarray(b2pow, object)[None, :]  # (tri,t2)
        wh = mult[:, None] * np.asarray(b1pow, object)[None, :]  # (tri,t1)
        wdiag = (iu == ju).astype(object)[:, None] \
            * np.asarray(b1pow, object)[None, :]
        g_tri = zq_ops.reshape(zq_ops.index(g_base, (iu, ju)),
                               (n_tri, 1, d))
        h_tri = zq_ops.reshape(zq_ops.index(h_base, (iu, ju)),
                               (n_tri, 1, d))
        vals_g = zq_ops.add(s_c, _scale_many_modq(g_tri, wg, plan, q), q)
        vals_h = zq_ops.add(s_d, _scale_many_modq(h_tri, wh, plan, q), q)
        vals_h = zq_ops.add(vals_h, _scale_many_modq(
            zq_ops.reshape(a18, (1, 1, d)), wdiag, plan, q), q)
        g0s = lay.garbage_pos(lay._tri_base())
        flat = setblk(flat, slice(g0s, g0s + n_tri * p0.t_2),
                      zq_ops.reshape(vals_g, (n_tri * p0.t_2, d)))
        h0s = g0s + n_tri * p0.t_2
        flat = setblk(flat, slice(h0s, h0s + n_tri * p0.t_1),
                      zq_ops.reshape(vals_h, (n_tri * p0.t_1, d)))
        return zq_ops.reshape(flat, (lay.r_new, lay.n_new, d))

    def a_alpha_modq(self, alpha):
        """sum_k alpha_k a_k  ->  (r', r', d) mod q.  Only the <z,z> family
        (f16) carries a quadratic part: a[f16][k,k2] = const(b^k b^k2)."""
        lay = self.layout
        p0 = lay.params
        q, d = p0.q, p0.d
        plan = self._base_plan()
        _, _, _, a16, _, _ = self._alpha_split(alpha)
        bpow = [pow(p0.b, k, q) for k in range(lay.nz)]
        out = zq_ops.zeros((lay.r_new, lay.r_new, d), q)
        for k in range(lay.nz):
            for k2 in range(lay.nz):
                val = _scale_modq(a16, bpow[k] * bpow[k2] % q, plan, q)
                out = zq_ops.tmap(lambda o, v: o.at[k, k2].set(v), out, val)
        return out


def fold(params: LabradorParams, state, proof: Transcript, crs,
         mu: int = 0, kappa_new: int = 16):
    """Structured recursive step (the scalable default): fold a proof into
    a new LaBRADOR instance WITHOUT materializing the dense relation.

    Returns (params_new, witness_new, FoldedState, layout) — run the
    standard prover/verifier on the result.  Works when the base `state`
    is itself a FoldedState (multi-level recursion)."""
    p = params
    layout = make_layout(p, mu)
    witness = build_witness(layout, proof)
    plan = ntt_ops.plan_for(p)
    q, d = p.q, p.d

    a_fin, phi_fin, b_fin = _canonical_aggregates(p, state, proof)
    c = proof.c
    c_hat = ntt_ops.ntt_fwd(c, plan)
    cc_hat = ntt_ops.eval_mul(c_hat[:, :, None, :], c_hat[:, None, :, :],
                              plan)
    cc = ntt_ops.ntt_inv_modq(cc_hat, plan)                   # (r, r, d)
    phi_fin_hat = ntt_ops.ntt_fwd(phi_fin, plan)
    pv = np.asarray(plan.primes)
    cphi = ntt_ops.ntt_inv_modq(ntt_ops._mod_sum_p(
        mod_pos(c_hat[:, :, None, :] * phi_fin_hat, pv), pv, axis=1),
        plan)                                                 # (n, d)

    # dense family-0 row (the single F' family): group-A row rho = 0
    bpow = [pow(p.b, k, q) for k in range(layout.nz)]
    b1pow = [pow(p.b_1, k, q) for k in range(p.t_1)]
    phi0 = zq_ops.zeros((1, layout.r_new, layout.n_new, d), q)
    a_row0 = zq_ops.index(crs.a_rows(0, 1), 0)                # (n, d)
    flat0 = zq_ops.zeros((layout.m_total, d), q)
    for k in range(layout.nz):
        pos = layout.z_pos(k, 0)
        flat0 = zq_ops.tmap(
            lambda o, v: o.at[pos:pos + p.n].set(v), flat0,
            _scale_modq(a_row0, bpow[k], plan, q))
    # big-q: c is the signed small-tensor convention — lift to canonical
    # two-limb before the generic subtract (round-4 bench-exposed fix)
    c_can = zq_ops.from_signed(c, q) if zq_ops.is_big(q) else c
    neg_c = zq_ops.sub(zq_ops.zeros((p.r, d), q), c_can, q)
    for i in range(p.r):
        for k2 in range(p.t_1):
            pos = layout.t_pos(i, k2, 0)
            flat0 = zq_ops.tmap(
                lambda o, v: o.at[pos].set(v), flat0,
                _scale_modq(zq_ops.index(neg_c, i), b1pow[k2], plan, q))
    phi0 = zq_ops.reshape(flat0, (1, layout.r_new, layout.n_new, d))

    # dense right-hand sides (k', d): 0 | u1 | u2 | 0 | 0 | b_fin
    b_k = zq_ops.zeros((layout.k_new, d), q)
    row1 = p.kappa
    row2 = row1 + p.kappa_1
    f18 = row2 + p.kappa_2 + 2
    b_k = zq_ops.tmap(lambda o, v: o.at[row1:row1 + p.kappa_1].set(v),
                      b_k, proof.u_1)
    b_k = zq_ops.tmap(lambda o, v: o.at[row2:row2 + p.kappa_2].set(v),
                      b_k, proof.u_2)
    b_k = zq_ops.tmap(lambda o, v: o.at[f18].set(v), b_k, b_fin)

    wc = np.asarray(_centered(witness, q))
    # sqrt(2) headroom over the actual digit-stream norm: the JL validity
    # bound 128*beta^2 must clear the projection's expectation 128*||w||^2
    # with margin, or every bounded retry is a coin flip (observed: level-2
    # folds failing all 6 JL attempts with beta = ||w||+1).
    beta_new = int(math.isqrt(2 * int((wc.astype(np.int64) ** 2).sum()))) + 1

    params_new = LabradorParams(
        n=layout.n_new, r=layout.r_new, q=q, d=p.d,
        k_count=layout.k_new, l_count=1,
        kappa_override=kappa_new, exact_digits=True,
        beta_override=beta_new)
    st = FoldedState(base_crs=crs, c=c, cc=cc, cphi=cphi, a_fin=a_fin,
                     phi0=phi0, b_k=b_k, layout=layout)
    return params_new, witness, st, layout


def folded_residual(st: FoldedState, witness, params_new: LabradorParams):
    """Exact residual of the folded relation on a (digit) witness, computed
    by *reconstructing* z, t, g, h from the witness layout and replaying
    the base verifier algebra (checks 15-20 + 16-18) against the carried
    right-hand sides.  Returns the max |residual| over all six groups —
    0 iff the witness satisfies the structured relation.  O(CRS) memory."""
    lay = st.layout
    p0 = lay.params
    q, d = p0.q, p0.d
    plan = ntt_ops.plan_for(p0)
    flat = zq_ops.reshape(witness, (lay.m_total, d))

    def at(pos):
        return zq_ops.index(flat, pos)

    bpow = [pow(p0.b, k, q) for k in range(lay.nz)]
    b1pow = [pow(p0.b_1, k, q) for k in range(p0.t_1)]
    b2pow = [pow(p0.b_2, k, q) for k in range(p0.t_2)]

    # reconstruct z, t, g, h mod q from their digit positions
    z = zq_ops.zeros((p0.n, d), q)
    for k in range(lay.nz):
        pos = lay.z_pos(k, 0)
        z = zq_ops.add(z, _scale_modq(
            zq_ops.index(flat, slice(pos, pos + p0.n)), bpow[k], plan, q), q)
    g0 = lay.garbage_pos(0)
    t_len = p0.r * p0.t_1 * p0.kappa
    t_dig = zq_ops.reshape(zq_ops.index(flat, slice(g0, g0 + t_len)),
                           (p0.r, p0.t_1, p0.kappa, d))
    t_dig = zq_ops.swapaxes(t_dig, 0, 1)                  # (t1, r, kap, d)
    t = zq_ops.zeros((p0.r, p0.kappa, d), q)
    for k in range(p0.t_1):
        t = zq_ops.add(t, _scale_modq(zq_ops.index(t_dig, k),
                                      b1pow[k], plan, q), q)
    g_dig = zq_ops.zeros((p0.t_2, p0.r, p0.r, d), q)
    h_dig = zq_ops.zeros((p0.t_1, p0.r, p0.r, d), q)
    g = zq_ops.zeros((p0.r, p0.r, d), q)
    h = zq_ops.zeros((p0.r, p0.r, d), q)
    for i in range(p0.r):
        for j in range(i, p0.r):
            for k in range(p0.t_2):
                v = at(lay.g_pos(i, j, k))
                g_dig = zq_ops.tmap(
                    lambda o, x: o.at[k, i, j].set(x).at[k, j, i].set(x),
                    g_dig, v)
            for k in range(p0.t_1):
                v = at(lay.h_pos(i, j, k))
                h_dig = zq_ops.tmap(
                    lambda o, x: o.at[k, i, j].set(x).at[k, j, i].set(x),
                    h_dig, v)
    # recompose g, h from their symmetric digit tensors
    for k in range(p0.t_2):
        g = zq_ops.add(g, _scale_modq(zq_ops.index(g_dig, k),
                                      b2pow[k], plan, q), q)
    for k in range(p0.t_1):
        h = zq_ops.add(h, _scale_modq(zq_ops.index(h_dig, k),
                                      b1pow[k], plan, q), q)

    crs = st.base_crs
    diffs = []

    def absmax(x):
        if isinstance(x, zq_ops.Zq2):
            # nonzero iff any limb nonzero
            return jnp.maximum(jnp.max(jnp.abs(x.hi)), jnp.max(jnp.abs(x.lo)))
        return jnp.max(x)

    def diff(a_, b_):
        diffs.append(absmax(zq_ops.sub(a_, b_, q)))

    # group A: A z == sum_i c_i t_i
    z_hat = ntt_ops.ntt_fwd(z, plan)
    az = zq_ops.index(
        protocol.ajtai_commit(crs, z_hat[:, None, :, :], p0, plan), 0)
    c_hat = ntt_ops.ntt_fwd(st.c, plan)
    t_hat = ntt_ops.ntt_fwd(t, plan)
    ct_terms = []
    for pi_, pr in enumerate(plan.primes):
        ct_terms.append(ntt_ops._mod_sum(
            mod_pos(c_hat[pi_][:, None, :] * t_hat[pi_], pr), pr, axis=0))
    ct = ntt_ops.ntt_inv_modq(jnp.stack(ct_terms), plan)
    diff(az, ct)
    # group B: u1 == B t_dig + C g_dig
    u1 = protocol.u1_from_digits(crs, t_dig, g_dig, p0, plan)
    diff(u1, zq_ops.index(st.b_k, slice(p0.kappa, p0.kappa + p0.kappa_1)))
    # group C: u2 == D h_dig
    u2 = protocol.u2_from_digits(crs, h_dig, p0, plan)
    row2 = p0.kappa + p0.kappa_1
    diff(u2, zq_ops.index(st.b_k, slice(row2, row2 + p0.kappa_2)))
    # f16: <z,z> == sum_ij cc_ij g_ij
    zz = ntt_ops.polyvec_inner_product(z, z, plan)
    cc_hat = ntt_ops.ntt_fwd(st.cc, plan)
    g_hat = ntt_ops.ntt_fwd(g, plan)
    s16 = []
    for pi_, pr in enumerate(plan.primes):
        s16.append(ntt_ops._mod_sum(
            mod_pos(cc_hat[pi_] * g_hat[pi_], pr).reshape(-1, d),
            pr, axis=0))
    diff(zz, ntt_ops.ntt_inv_modq(jnp.stack(s16), plan))
    # f17: <cphi, z> == sum_ij cc_ij h_ij
    cz = ntt_ops.polyvec_inner_product(st.cphi, z, plan)
    h_hat = ntt_ops.ntt_fwd(h, plan)
    s17 = []
    for pi_, pr in enumerate(plan.primes):
        s17.append(ntt_ops._mod_sum(
            mod_pos(cc_hat[pi_] * h_hat[pi_], pr).reshape(-1, d),
            pr, axis=0))
    diff(cz, ntt_ops.ntt_inv_modq(jnp.stack(s17), plan))
    # f18: sum_ij a_fin_ij g_ij + sum_i h_ii == b_fin
    a_fin_hat = ntt_ops.ntt_fwd(st.a_fin, plan)
    s18 = []
    for pi_, pr in enumerate(plan.primes):
        s18.append(ntt_ops._mod_sum(
            mod_pos(a_fin_hat[pi_] * g_hat[pi_], pr).reshape(-1, d),
            pr, axis=0))
    lhs18 = ntt_ops.ntt_inv_modq(jnp.stack(s18), plan)
    hdiag = zq_ops.zeros((d,), q)
    for i in range(p0.r):
        hdiag = zq_ops.add(hdiag, zq_ops.index(h, (i, i)), q)
    f18 = row2 + p0.kappa_2 + 2
    diff(zq_ops.add(lhs18, hdiag, q), zq_ops.index(st.b_k, f18))
    return jnp.max(jnp.stack(diffs))


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
    # sqrt(2) headroom over the actual digit-stream norm: the JL validity
    # bound 128*beta^2 must clear the projection's expectation 128*||w||^2
    # with margin, or every bounded retry is a coin flip (observed: level-2
    # folds failing all 6 JL attempts with beta = ||w||+1).
    beta_new = int(math.isqrt(2 * int((wc.astype(np.int64) ** 2).sum()))) + 1

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
