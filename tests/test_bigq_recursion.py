"""Norm-tight recursive composition at the 2^32-scale modulus.

At q = 8191 the digit-stream norm of a folded instance necessarily exceeds
the paper's beta(q) = floor(sqrt(30/128) q / 125) bound, so recursion there
must carry an explicit ``beta_override`` (see recursion.py docstring).  At
q ~ 2^32 the bound is ~16.6M while the digit witness norm is in the 10^5
range: the folded instance is *norm-tight* in LaBRADOR's own sense (§5.4) —
this is the capability the big-q limb path exists for.
"""

import math

import numpy as np
import pytest
import jax

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs, prover, verifier, recursion
from labrador_tpu.crs import CRS
from labrador_tpu.ops import zq

P = LabradorParams(n=2, r=2, q_start=(1 << 32) - 1, kappa_override=16,
                   exact_digits=True)


@pytest.fixture(scope="module")
def base():
    key = jax.random.key(424242)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, P)
    state = structs.generate_state(ks, witness, P)
    crs = CRS.create(P, seed=0xB16)
    proof = prover.prove(P, witness, state, crs, kv, decomp_mode="exact")
    return witness, state, crs, proof


@pytest.fixture(scope="module")
def folded(base):
    _, state, crs, proof = base
    return recursion.recursive_step(P, state, proof, crs)


def test_base_proof_verifies(base):
    _, state, crs, proof = base
    rep = verifier.verify_report(P, state, proof, crs, decomp_mode="exact")
    failed = [k for k, v in rep.items() if not bool(np.asarray(v))]
    assert not failed, failed


def test_folded_relation_holds(folded):
    p_new, w_new, s_new, layout = folded
    res = recursion.relation_residual(s_new.a_k, s_new.phi_k, s_new.b_k,
                                      w_new, p_new)
    assert int(res) == 0
    assert isinstance(s_new.phi_k, zq.Zq2)


def test_folded_relation_rejects_tamper(folded):
    p_new, w_new, s_new, _ = folded
    w_bad = w_new.at[0, 0, 0].add(1)
    res = recursion.relation_residual(s_new.a_k, s_new.phi_k, s_new.b_k,
                                      w_bad, p_new)
    assert int(res) != 0


def test_norm_tightness(folded):
    """The folded witness norm fits the beta(q) the derivation formulas
    would assign — impossible at q = 8191, the point of big q."""
    p_new, w_new, s_new, _ = folded
    derived_beta = math.floor(math.sqrt(30.0 / 128.0) * float(P.q) / 125.0)
    assert p_new.beta_bound <= derived_beta
    # and the witness actually satisfies it
    wsq = (np.asarray(w_new).astype(np.int64) ** 2).sum()
    assert wsq <= derived_beta**2


def test_recursive_prove_verify(folded):
    p_new, w_new, s_new, _ = folded
    crs_new = CRS.create(p_new, seed=0x5EC1)
    kv = jax.random.key(17)
    proof_new = prover.prove(p_new, w_new, s_new, crs_new, kv,
                             decomp_mode="exact")
    assert bool(proof_new.jl_ok) and bool(proof_new.b_pp_ok)
    rep = verifier.verify_report(p_new, s_new, proof_new, crs_new,
                                 decomp_mode="exact")
    failed = [k for k, v in rep.items() if not bool(np.asarray(v))]
    assert not failed, f"folded-instance checks failed: {failed}"
