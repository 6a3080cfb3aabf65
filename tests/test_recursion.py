"""Recursive proof composition (BASELINE.json config 5 structure):
fold a verified base proof into a new principal relation, check the new
witness satisfies it exactly, and run prove+verify on the folded instance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs, prover, verifier, recursion
from labrador_tpu.crs import CRS

# small base instance with a realistic (constant) commitment rank so the
# folded instance stays test-sized; exact digits are required for folding
P = LabradorParams(n=2, r=2, kappa_override=16, exact_digits=True)


@pytest.fixture(scope="module")
def base():
    key = jax.random.key(31337)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, P)
    state = structs.generate_state(ks, witness, P)
    crs = CRS.create(P, seed=0xEC)
    proof = prover.prove(P, witness, state, crs, kv, decomp_mode="exact")
    return witness, state, crs, proof


def test_base_proof_verifies(base):
    _, state, crs, proof = base
    rep = verifier.verify_report(P, state, proof, crs, decomp_mode="exact")
    for k in ("c08_g_symmetric", "c09_h_symmetric", "c15_az_vs_ct",
              "c16_zz_vs_gcc", "c17_phiz_vs_hcc", "c18_agg_relation",
              "c19_u1", "c20_u2", "c21_b_pp_const"):
        assert bool(rep[k]), k


def test_folded_relation_holds(base):
    """The digit witness satisfies the folded relation exactly — the
    algebraic heart of recursion."""
    _, state, crs, proof = base
    p_new, w_new, s_new, layout = recursion.recursive_step(P, state, proof, crs)
    res = recursion.relation_residual(s_new.a_k, s_new.phi_k, s_new.b_k,
                                      w_new, p_new)
    assert int(res) == 0
    assert p_new.k_count == P.kappa + P.kappa_1 + P.kappa_2 + 3
    assert layout.r_new == layout.nz + layout.mu


def test_folded_relation_rejects_tampered_witness(base):
    _, state, crs, proof = base
    p_new, w_new, s_new, _ = recursion.recursive_step(P, state, proof, crs)
    w_bad = w_new.at[0, 0, 0].add(1)
    res = recursion.relation_residual(s_new.a_k, s_new.phi_k, s_new.b_k,
                                      w_bad % p_new.q, p_new)
    assert int(res) != 0


def test_recursive_prove_verify(base):
    """One level of recursion end-to-end: prove the folded instance and run
    the full check battery on it."""
    _, state, crs, proof = base
    p_new, w_new, s_new, _ = recursion.recursive_step(P, state, proof, crs)
    crs_new = CRS.create(p_new, seed=0x5EC0)
    kv = jax.random.key(99)
    proof_new = prover.prove(p_new, w_new, s_new, crs_new, kv,
                             decomp_mode="exact")
    assert bool(proof_new.jl_ok)
    assert bool(proof_new.b_pp_ok)
    rep = verifier.verify_report(p_new, s_new, proof_new, crs_new,
                                 decomp_mode="exact")
    for k in ("c08_g_symmetric", "c09_h_symmetric", "c15_az_vs_ct",
              "c16_zz_vs_gcc", "c17_phiz_vs_hcc", "c18_agg_relation",
              "c19_u1", "c20_u2", "c21_b_pp_const"):
        assert bool(rep[k]), k
