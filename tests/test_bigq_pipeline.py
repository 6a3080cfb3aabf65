"""End-to-end protocol at the 2^32-scale modulus.

The reference sketches this configuration (the commented
``find_suitable_prime((1 << 32) - 1)`` at ``constants.rs:196``) but cannot
run it: its NTT path wraps at 2^64 (``algebraic.rs:417-419``) and silently
corrupts convolutions.  Here the whole pipeline — CRS, sampling,
aggregations, commitments, all 14 checks — runs on the two-limb (Zq2)
representation with exact CRT arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from labrador_tpu.params import LabradorParams, find_suitable_prime
from labrador_tpu import sampling, structs, prover, verifier
from labrador_tpu.crs import CRS
from labrador_tpu.ops import zq


Q_BIG = find_suitable_prime((1 << 32) - 1)   # 4294967311


@pytest.fixture(scope="module")
def big_setup():
    p = LabradorParams(n=2, r=2, q_start=(1 << 32) - 1, exact_digits=True)
    assert p.q == Q_BIG
    key = jax.random.PRNGKey(7)
    kw, ks, kv = jax.random.split(key, 3)
    w = sampling.generate_witness(kw, p)
    state = structs.generate_state(ks, w, p)
    crs = CRS.create(p, seed=12345)
    proof = prover.prove(p, w, state, crs, kv, decomp_mode="exact")
    return p, w, state, crs, kv, proof


def test_bigq_prover_self_checks(big_setup):
    p, w, state, crs, kv, proof = big_setup
    assert bool(proof.jl_ok) and bool(proof.b_pp_ok)
    # transcript residues are canonical two-limb
    assert isinstance(proof.u_1, zq.Zq2)
    u1 = zq.to_py(proof.u_1)
    assert u1.min() >= 0 and u1.max() < p.q and u1.max() > (1 << 31)


def test_bigq_verify_all_checks(big_setup):
    p, w, state, crs, kv, proof = big_setup
    rep = verifier.verify_report(p, state, proof, crs, decomp_mode="exact")
    failed = [k for k, v in rep.items() if not bool(np.asarray(v))]
    assert not failed, f"failed checks at q=2^32-scale: {failed}"


def test_bigq_tamper_rejected(big_setup):
    p, w, state, crs, kv, proof = big_setup
    # flip one coefficient of z (low limb, stays in range)
    z_bad = zq.Zq2(proof.z.hi, proof.z.lo.at[0, 0].set(
        (proof.z.lo[0, 0] + 1) % (1 << 16)))
    bad = proof.replace(z=z_bad)
    rep = verifier.verify_report(p, state, bad, crs, decomp_mode="exact")
    assert not bool(np.asarray(rep["all"]))


def test_bigq_witness_small_and_bounded(big_setup):
    p, w, state, crs, kv, proof = big_setup
    from labrador_tpu.ops.modmath import sum_sq_u64, u64_to_py
    assert int(jnp.min(w)) >= 0
    assert u64_to_py(sum_sq_u64(w)) <= p.beta_bound**2


def test_bigq_digit_reconstruction(big_setup):
    """Exact balanced digits at big q reconstruct t mod q."""
    p, w, state, crs, kv, proof = big_setup
    from labrador_tpu import protocol
    t_dig = np.asarray(protocol.decompose_t(proof.t, p, "exact"), np.int64)
    t_true = zq.to_py(proof.t).astype(object)
    rec = sum(t_dig[k].astype(object) * (p.b_1 ** k)
              for k in range(p.t_1))
    assert ((rec - t_true) % p.q == 0).all()


def test_bigq_transcript_roundtrip(tmp_path, big_setup):
    p, w, state, crs, kv, proof = big_setup
    path = str(tmp_path / "proof_big.npz")
    structs.save_transcript(proof, path)
    loaded = structs.load_transcript(path)
    for f in proof.__dataclass_fields__:
        a, b = getattr(proof, f), getattr(loaded, f)
        if isinstance(a, zq.Zq2):
            assert (np.asarray(a.hi) == np.asarray(b.hi)).all()
            assert (np.asarray(a.lo) == np.asarray(b.lo)).all()
        else:
            assert (np.asarray(a) == np.asarray(b)).all()
    # size metric counts the full-width residues
    size = structs.transcript_size_in_bytes(proof, p.q)
    assert size > 0


def test_fs_jl_norm_wrap_rejected(big_setup):
    """Adversarial projection whose sum of squares wraps mod 2^64: 256
    entries of 2^28 give a true sum of exactly 2^64 (== 0 wrapped), which
    the raw emulated-u64 comparison alone would accept.  The per-entry
    precheck (|p_i| <= sqrt(128)*beta) must reject it (ADVICE r1 high)."""
    p, w, state, crs, kv, proof = big_setup
    forged = zq.from_signed(jnp.full((256,), 1 << 28, jnp.int32), p.q)
    fs = verifier.fs_challenge_report(p, proof.replace(projection=forged),
                                      crs)
    assert not bool(np.asarray(fs["fs_jl_norm"]))
    # sanity: the wrap really happens (raw sum compares below the bound)
    from labrador_tpu.ops.modmath import sum_sq_u64, u64_leq_const
    centered = zq.to_signed_small(forged, p.q)
    wrapped_ok = u64_leq_const(sum_sq_u64(centered),
                               128 * p.beta_bound * p.beta_bound)
    assert bool(np.asarray(wrapped_ok))  # the bug the precheck closes
