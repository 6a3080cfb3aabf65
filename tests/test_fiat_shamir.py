"""Fiat-Shamir mode: non-interactive proofs verify, challenge provenance is
enforced, and tampering with any absorbed message breaks derivation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs, prover, verifier
from labrador_tpu.crs import CRS
from labrador_tpu.ops.modmath import mod_pos

P = LabradorParams(n=2, r=2)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(777)
    kw, ks = jax.random.split(key)
    witness = sampling.generate_witness(kw, P)
    state = structs.generate_state(ks, witness, P)
    crs = CRS.create(P, seed=0xF1A75A)
    proof = prover.prove_fs(P, witness, state, crs)
    return witness, state, crs, proof


def test_fs_proof_accepts(setup):
    _, state, crs, proof = setup
    assert bool(proof.jl_ok) and bool(proof.b_pp_ok)
    assert verifier.verify_fs(P, state, proof, crs)


def test_fs_challenges_match(setup):
    _, state, crs, proof = setup
    fs = verifier.fs_challenge_report(P, state, proof, crs)
    failed = [k for k, v in fs.items() if not bool(v)]
    assert not failed, failed


def test_fs_rejects_forged_challenge(setup):
    """A prover cannot substitute its own challenge c."""
    _, state, crs, proof = setup
    bad_c = mod_pos(proof.c.at[0, 0].add(1), P.q)
    fs = verifier.fs_challenge_report(P, state, proof.replace(c=bad_c), crs)
    assert not bool(fs["fs_challenge"])


def test_fs_rejects_tampered_u1_derivation(setup):
    """Changing u1 changes every downstream challenge derivation."""
    _, state, crs, proof = setup
    bad_u1 = mod_pos(proof.u_1.at[0, 0].add(1), P.q)
    fs = verifier.fs_challenge_report(P, state, proof.replace(u_1=bad_u1), crs)
    assert not bool(fs["fs_all"])


def test_fs_deterministic(setup):
    """Same witness/state/CRS -> identical transcript (no hidden entropy)."""
    witness, state, crs, proof = setup
    proof2 = prover.prove_fs(P, witness, state, crs)
    np.testing.assert_array_equal(np.asarray(proof.c), np.asarray(proof2.c))
    np.testing.assert_array_equal(np.asarray(proof.z), np.asarray(proof2.z))


def test_fs_statement_binding(setup):
    """A proof is bound to its statement: re-deriving the challenges under
    a DIFFERENT state (same CRS, same transcript) must fail provenance —
    the initial sponge state absorbs the constraint families (FS_SPEC.md
    §2), so challenges cannot be transplanted across statements."""
    witness, state, crs, proof = setup
    other = structs.generate_state(jax.random.key(4242), witness, P)
    fs = verifier.fs_challenge_report(P, other, proof, crs)
    assert not bool(fs["fs_all"])
    # every post-seed challenge diverges, not just one
    assert not bool(fs["fs_psi"]) and not bool(fs["fs_challenge"])


def test_interactive_and_fs_differ(setup):
    witness, state, crs, _ = setup
    p1 = prover.prove(P, witness, state, crs, jax.random.key(3))
    p2 = prover.prove_fs(P, witness, state, crs)
    assert (np.asarray(p1.c) != np.asarray(p2.c)).any()
