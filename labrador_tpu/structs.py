"""Protocol objects: constraint system State and proof Transcript.

Counterparts of the reference ``State`` (``structs.rs:269-388``) and
``Transcript`` (``structs.rs:192-221``), as JAX pytree dataclasses of
batched coefficient tensors.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .params import LabradorParams
from .ops import ntt as ntt_ops
from .ops import zq as zq_ops
from .ops.modmath import mod_pos
from . import sampling


@struct.dataclass
class State:
    """Families F and F' of the principal relation.

    Shapes: a_k (K, r, r, d) symmetric in (i, j); phi_k (K, r, n, d) with
    phi_k[k, i] the length-n vector for witness index i; b_k (K, d).
    F' mirrors F with b'_k = b_k(0) (constant term), exactly like the
    reference's simplification at ``structs.rs:352-374``.
    """

    a_k: jax.Array
    phi_k: jax.Array
    b_k: jax.Array
    a_prime_k: jax.Array
    phi_prime_k: jax.Array
    b_prime_k: jax.Array  # (K,) constant coefficients


@struct.dataclass
class Transcript:
    """All prover messages (``structs.rs:193-209``)."""

    u_1: jax.Array            # (kappa_1, d)
    pi: jax.Array             # (r, 256, n*d) int8 — JL matrices
    projection: jax.Array     # (256,) int32 mod q (lifted, proofgen.rs:186)
    psi: jax.Array            # (upper_bound, L)
    omega: jax.Array          # (upper_bound, 256)
    b_prime_prime: jax.Array  # (upper_bound, d)
    alpha: jax.Array          # (K, d)
    beta: jax.Array           # (upper_bound, d)
    u_2: jax.Array            # (kappa_2, d)
    c: jax.Array              # (r, d)
    z: jax.Array              # (n, d)
    t: jax.Array              # (r, kappa, d)
    g: jax.Array              # (r, r, d)
    h: jax.Array              # (r, r, d)
    # prover-side self-check flags (not messages): JL acceptance and the
    # b'' constant-term check (proofgen.rs:280, verification.rs:532-551)
    jl_ok: jax.Array
    b_pp_ok: jax.Array


# every transcript message field (excludes the prover self-check flags and
# ``pi``, whose (r, 256, n*d) layout needs no Zq decoding) — the parity
# surface shared by tests/test_sharded.py and benchmarks/sharded_scaling.py
TRANSCRIPT_FIELDS = ("u_1", "u_2", "t", "g", "h", "z", "c", "projection",
                     "psi", "omega", "b_prime_prime", "alpha", "beta")


def state_from_constraints(a_k: jax.Array, phi_k: jax.Array,
                           witness: jax.Array,
                           params: LabradorParams) -> State:
    """Build a State from user-supplied constraint families.

    a_k: (K, r, r, d) symmetric quadratic coefficients; phi_k: (K, r, n, d)
    linear coefficients; b_k is derived so each family is satisfied by
    `witness` (the same b-derivation as ``gen_f``, structs.rs:320-341).
    This is the entry point for proving *your own* relation rather than the
    random demo families of generate_state.
    """
    p = params
    plan = ntt_ops.plan_for(p)
    a_k = _canon(a_k, p.q)
    phi_k = _canon(phi_k, p.q)
    K = a_k.shape[0]

    s_hat = ntt_ops.ntt_fwd(witness, plan)
    g = ntt_ops.ntt_inv_modq(_gram_hat(s_hat, plan), plan)
    g_hat = ntt_ops.ntt_fwd(g, plan)
    a_hat = ntt_ops.ntt_fwd(a_k, plan)
    phi_hat = ntt_ops.ntt_fwd(phi_k, plan)
    pv = np.asarray(plan.primes)
    P = len(pv)
    term_a = ntt_ops._mod_sum_p(
        mod_pos(a_hat * g_hat[:, None], pv).reshape(P, K, -1, p.d),
        pv, axis=2)
    term_phi = ntt_ops._mod_sum_p(
        mod_pos(phi_hat * s_hat[:, None], pv).reshape(P, K, -1, p.d),
        pv, axis=2)
    b_k = ntt_ops.ntt_inv_modq(mod_pos(term_a + term_phi, pv), plan)

    return State(a_k=a_k, phi_k=phi_k, b_k=b_k,
                 a_prime_k=a_k, phi_prime_k=phi_k,
                 b_prime_k=zq_ops.index(b_k, (slice(None), 0)))


def _canon(x, q: int):
    """User-supplied constraint tensors -> canonical ZqT: Zq2 passes
    through; plain arrays are interpreted as signed integers (any sign,
    |v| < q) and lifted."""
    if isinstance(x, zq_ops.Zq2):
        return x
    if zq_ops.is_big(q):
        return zq_ops.from_signed(jnp.asarray(x, jnp.int32), q)
    return mod_pos(jnp.asarray(x, jnp.int32), q)


def generate_state(key: jax.Array, witness: jax.Array,
                   params: LabradorParams) -> State:
    """Random constraint families satisfied by `witness`, mirroring
    ``State::new``/``gen_f`` (``structs.rs:289-388``): symmetric random a_k,
    random phi_k, and b_k derived so the relation holds."""
    p = params
    ka, kphi = jax.random.split(key)

    # symmetric a: sample full, take value from the first-visited (i<=j) slot
    a_full = sampling.uniform_zq(ka, (p.k_count, p.r, p.r, p.d), p.q)
    ii = jnp.arange(p.r)[:, None]
    jj = jnp.arange(p.r)[None, :]
    iu = jnp.minimum(ii, jj)
    ju = jnp.maximum(ii, jj)
    a_k = zq_ops.tmap(lambda a: a[:, iu, ju, :], a_full)

    phi_k = sampling.uniform_zq(kphi, (p.k_count, p.r, p.n, p.d), p.q)
    return state_from_constraints(a_k, phi_k, witness, p)


def _gram_hat(s_hat: jax.Array, plan) -> jax.Array:
    """G_ij = <s_i, s_j> in eval domain: (P, r, n, d) -> (P, r, r, d)."""
    st = jnp.swapaxes(s_hat, -3, -2)  # (P, n, r, d)
    return ntt_ops.eval_matmul(s_hat, st, plan)


# ---------------------------------------------------------------------------
# Serialization / size metric
# ---------------------------------------------------------------------------

def _i128_le(flat: np.ndarray) -> np.ndarray:
    """(N,) integer array -> (N, 16) uint8 two's-complement i128 LE
    (vectorized: Zq values fit int64, the high quadword is the sign
    extension).  A Python per-coefficient loop here made proof-size
    accounting O(hours) at the 2^20 configs (268M JL coefficients)."""
    v = flat.astype(np.int64).reshape(-1)
    out = np.zeros((v.size, 16), np.uint8)
    out[:, :8] = v.astype("<i8").view(np.uint8).reshape(-1, 8)
    out[:, 8:] = np.where(v < 0, np.uint8(0xFF), np.uint8(0))[:, None]
    return out


def _bincode_poly_vec(arr: np.ndarray, chunk_rows: int = 1 << 16):
    """Vec<Rq> in bincode layout: u64 LE count, then per element u64 LE
    coefficient count + i128 LE coefficients (serde impls at
    ``algebraic.rs:422-429``; Zq is a single i128 field).  Yields byte
    chunks so multi-GB fields stream straight into the compressor."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    n, d = flat.shape
    yield n.to_bytes(8, "little")
    pre = np.frombuffer(int(d).to_bytes(8, "little"), np.uint8)
    for s in range(0, n, chunk_rows):
        blk = flat[s:s + chunk_rows]
        rows = np.concatenate(
            [np.broadcast_to(pre, (len(blk), 8)),
             _i128_le(blk).reshape(len(blk), d * 16)], axis=1)
        yield rows.tobytes()


def _bincode_zq_vec(arr: np.ndarray, chunk: int = 1 << 22):
    arr = np.asarray(arr).reshape(-1)
    yield len(arr).to_bytes(8, "little")
    for s in range(0, arr.size, chunk):
        yield _i128_le(arr[s:s + chunk]).tobytes()


def save_transcript(tr: Transcript, path: str) -> None:
    """Persist a transcript (the reference's only persistence is the
    serde/bincode serialization at structs.rs:212-221; here: npz).
    Two-limb (big-q) fields store their limbs under ``<name>__hi/__lo``."""
    arrays = {}
    for f in tr.__dataclass_fields__:
        v = getattr(tr, f)
        if isinstance(v, zq_ops.Zq2):
            arrays[f + "__hi"] = np.asarray(v.hi)
            arrays[f + "__lo"] = np.asarray(v.lo)
        else:
            arrays[f] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_transcript(path: str) -> Transcript:
    with np.load(path) as z:
        fields = {}
        for k in z.files:
            if k.endswith("__hi"):
                name = k[:-4]
                fields[name] = zq_ops.Zq2(jnp.asarray(z[k]),
                                          jnp.asarray(z[name + "__lo"]))
            elif k.endswith("__lo"):
                continue
            else:
                fields[k] = jnp.asarray(z[k])
        return Transcript(**fields)


def transcript_size_in_bytes(tr: Transcript, q: int,
                             fs: bool = False) -> int:
    """Compressed transcript size: bincode-equivalent byte layout + gzip at
    max compression, matching ``Transcript::size_in_bytes``
    (``structs.rs:212-221``) so proof-size numbers are comparable.

    The JL matrices are serialized lifted mod q (the reference lifts them to
    Zq before storing, ``proofgen.rs:445-453``).

    ``fs=True`` measures the NON-INTERACTIVE proof: verifier randomness
    (Pi, psi, omega, alpha, beta, c) is re-derived from the Fiat-Shamir
    sponge (FS_SPEC.md) and does not ship — only the prover messages
    u1, p, b'', u2, z, t, g, h do.  The reference metric stores everything
    (it models the interactive transcript), which makes the serialized JL
    matrices dominate and can never let a folded proof shrink; the FS
    metric is the one recursion is judged by (PERF.md recursion table)."""
    # field order is the reference's Transcript declaration order
    # (structs.rs:193-209) — byte-stream parity with the refsim depends on
    # it; fs=True simply drops the derivable fields, keeping that order
    parts = [_bincode_poly_vec(zq_ops.to_py(tr.u_1))]
    if not fs:
        parts += [_bincode_zq_vec(np.asarray(tr.pi, np.int64) % q)]
    parts += [_bincode_zq_vec(zq_ops.to_py(tr.projection))]
    if not fs:
        parts += [_bincode_zq_vec(zq_ops.to_py(tr.psi)),
                  _bincode_zq_vec(zq_ops.to_py(tr.omega))]
    parts += [_bincode_poly_vec(zq_ops.to_py(tr.b_prime_prime))]
    if not fs:
        parts += [_bincode_poly_vec(zq_ops.to_py(tr.alpha)),
                  _bincode_poly_vec(zq_ops.to_py(tr.beta))]
    parts += [_bincode_poly_vec(zq_ops.to_py(tr.u_2))]
    if not fs:
        parts += [_bincode_poly_vec(zq_ops.to_py(tr.c))]
    parts += [
        _bincode_poly_vec(zq_ops.to_py(tr.z)),
        _bincode_poly_vec(zq_ops.to_py(tr.t)),
        _bincode_poly_vec(zq_ops.to_py(tr.g)),
        _bincode_poly_vec(zq_ops.to_py(tr.h)),
    ]
    # stream the compression: at 2^20 the bincode image is ~4.3 GB (the
    # (r, 256, n*d) JL matrices serialize as i128 per entry), so the
    # writers yield chunks and nothing bigger than one chunk is ever live
    comp = zlib.compressobj(9)
    total = 0
    for part in parts:
        for blk in part:
            total += len(comp.compress(blk))
    return total + len(comp.flush())
