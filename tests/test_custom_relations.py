"""User-facing constraint API with meaningful (non-random) relations
(VERDICT r2 #9: exercise the public State surface, structs.rs:269-388).

Three instances:
  * the shipped example (examples/custom_relation.py) as a test,
  * a two-gate arithmetic circuit over Rq (one multiplication gate, one
    addition gate — an R1CS-style system with K = 2 constraint families),
  * a subset-sum instance over the coefficient vector via the F' family's
    constant-term constraint and the sigma^{-1} packing trick
    (const<sigma_inv(a), b> = <coeffs a, coeffs b>, tests/proptest.rs:67-81).

Each has a soundness negative: a violated relation must be rejected by the
specific check that guards it.
"""

import importlib.util
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu import structs, prover, verifier
from labrador_tpu.crs import CRS
from labrador_tpu.ops import rq as rq_ops


def test_example_custom_relation_runs():
    """The shipped example must prove and verify end-to-end."""
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "custom_relation.py")
    spec = importlib.util.spec_from_file_location("custom_relation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()  # asserts internally


def _circuit_state(p):
    """Two-gate circuit over wires s_0..s_3 (each one ring element, n=1):

        gate 0 (mul):  s_0 * s_1 - s_2 = 0     (full-ring family 0)
        gate 1 (add):  s_0 + s_1 - s_3 = 0     (full-ring family 1)

    Family 0: a_{01} = a_{10} = 2^{-1} (so the symmetric sum is exactly
    s_0 s_1), phi_2 = -1.  Family 1 is purely linear."""
    d, q = p.d, p.q
    inv2 = pow(2, q - 2, q)
    a_k = np.zeros((2, p.r, p.r, d), np.int64)
    a_k[0, 0, 1, 0] = inv2
    a_k[0, 1, 0, 0] = inv2
    phi_k = np.zeros((2, p.r, p.n, d), np.int64)
    phi_k[0, 2, 0, 0] = q - 1        # -s_2
    phi_k[1, 0, 0, 0] = 1            # +s_0
    phi_k[1, 1, 0, 0] = 1            # +s_1
    phi_k[1, 3, 0, 0] = q - 1        # -s_3
    return jnp.asarray(a_k, jnp.int32), jnp.asarray(phi_k, jnp.int32)


def test_rq_circuit_two_gates():
    p = LabradorParams(n=1, r=4, k_count=2, kappa_override=64)
    d, q = p.d, p.q
    # witness wires: x = X^5, y = 3 X^10, z = x*y = 3 X^15, w = x + y
    wit = np.zeros((4, 1, d), np.int64)
    wit[0, 0, 5] = 1
    wit[1, 0, 10] = 3
    wit[2, 0, 15] = 3
    wit[3, 0, 5] = 1
    wit[3, 0, 10] = 3
    witness = jnp.asarray(wit, jnp.int32)

    a_k, phi_k = _circuit_state(p)
    state = structs.state_from_constraints(a_k, phi_k, witness, p)
    # both gates hold identically, so the derived b polynomials are zero
    assert not np.asarray(state.b_k).any()

    crs = CRS.create(p, seed=0xC1C)
    proof = prover.prove(p, witness, state, crs, jax.random.key(5))
    assert bool(proof.jl_ok) and bool(proof.b_pp_ok)
    rep = verifier.verify_report(p, state, proof, crs)
    failed = [k for k, v in rep.items() if not bool(np.asarray(v))]
    assert not failed, failed

    # soundness: break the multiplication gate (z' = z + X^3).  The state
    # still claims b = 0, so the witness no longer satisfies family 0:
    # the in-protocol b'' constant check and check 18 must catch it.
    bad = wit.copy()
    bad[2, 0, 3] += 1
    bad_proof = prover.prove(p, jnp.asarray(bad, jnp.int32), state, crs,
                             jax.random.key(5))
    bad_rep = verifier.verify_report(p, state, bad_proof, crs)
    assert not bool(np.asarray(bad_rep["c18_agg_relation"]))
    assert not bool(np.asarray(bad_rep["all"]))


def test_subset_sum_constant_term():
    """Subset-sum through F': prove <pub, w> = target for the coefficient
    vector w of s_0, using phi'_0 = sigma_inv(packed pub) so the constant
    term of <phi'_0, s_0> is the plain Zq inner product."""
    p = LabradorParams(n=2, r=2, kappa_override=64)
    d, q = p.d, p.q
    rng = np.random.default_rng(14)
    pub = rng.integers(0, 1000, p.n * d)            # public weights
    w = rng.integers(0, 2, p.n * d)                 # secret subset selector
    target = int((pub * w).sum() % q)

    wit = np.zeros((p.r, p.n, d), np.int64)
    wit[0] = w.reshape(p.n, d)
    wit[1, 0, 0] = 1                                # dummy second vector
    witness = jnp.asarray(wit, jnp.int32)

    a_k = jnp.zeros((1, p.r, p.r, d), jnp.int32)
    phi = np.zeros((1, p.r, p.n, d), np.int64)
    phi[0, 0] = np.asarray(
        rq_ops.sigma_inv(jnp.asarray(pub.reshape(p.n, d) % q, jnp.int32), q))
    phi_k = jnp.asarray(phi, jnp.int32)

    state = structs.state_from_constraints(a_k, phi_k, witness, p)
    # the F' constant term IS the subset sum
    assert int(np.asarray(state.b_prime_k)[0]) == target

    crs = CRS.create(p, seed=0x55B)
    proof = prover.prove_fs(p, witness, state, crs)
    assert bool(proof.jl_ok) and bool(proof.b_pp_ok)
    assert verifier.verify_fs(p, state, proof, crs)

    # soundness: claiming a different sum must fail the b'' constant check
    lied = state.replace(
        b_prime_k=(state.b_prime_k + 1) % q)
    rep = verifier.verify_report(p, lied, proof, crs)
    assert not bool(np.asarray(rep["c21_b_pp_const"]))
    assert not bool(np.asarray(rep["all_with_bpp"]))
