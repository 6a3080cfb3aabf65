"""Sharded prover/verifier on the 8-virtual-device CPU mesh.

The multi-chip path is ``prove_impl``/``verify_report_impl`` under
shard_map (one protocol implementation — parallel/sharded.py), so the
matrix {small-q, big-q} x {interactive, Fiat-Shamir} must produce
transcripts byte-identical to the single-chip prover, and the row-sharded
verifier must agree with the single-chip verifier on every check."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs, prover, verifier
from labrador_tpu.crs import CRS
from labrador_tpu.ops import zq
from labrador_tpu.parallel.mesh import make_mesh
from labrador_tpu.parallel.sharded import (make_sharded_prover,
                                           make_sharded_verifier)

P_SMALL = LabradorParams(n=2, r=2)
P_BIG = LabradorParams(n=2, r=2, q_start=(1 << 32) - 1, kappa_override=16,
                       exact_digits=True)

TRANSCRIPT_FIELDS = structs.TRANSCRIPT_FIELDS


def _setup(params, seed=5150):
    key = jax.random.key(seed)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, params)
    state = structs.generate_state(ks, witness, params)
    crs = CRS.create(params, seed=0x5EED)
    return witness, state, crs, kv


def _assert_transcripts_equal(got_b, want, b):
    for name in TRANSCRIPT_FIELDS:
        w = zq.to_py(getattr(want, name))
        g = zq.to_py(zq.index(getattr(got_b, name), b))
        np.testing.assert_array_equal(g, w, err_msg=name)


@pytest.mark.parametrize("params,decomp", [(P_SMALL, "reference"),
                                           (P_BIG, "exact")],
                         ids=["smallq", "bigq"])
def test_sharded_matches_single_chip_interactive(params, decomp):
    witness, state, crs, kv = _setup(params)
    want = prover.prove(params, witness, state, crs, kv, decomp_mode=decomp)

    mesh = make_mesh(n_dp=2, n_rows=4)
    fn = make_sharded_prover(params, mesh, decomp_mode=decomp)
    B = 2
    wit_b = jnp.stack([witness] * B)
    state_b = jax.tree.map(lambda x: jnp.stack([x] * B), state)
    got = fn(wit_b, state_b, jnp.stack([crs.key] * B), jnp.stack([kv] * B))
    for b in range(B):
        _assert_transcripts_equal(got, want, b)


@pytest.mark.parametrize("params,decomp", [(P_SMALL, "reference"),
                                           (P_BIG, "exact")],
                         ids=["smallq", "bigq"])
def test_sharded_matches_single_chip_fs(params, decomp):
    """Fiat-Shamir mode sharded == single-chip prove_fs, byte for byte."""
    witness, state, crs, kv = _setup(params, seed=616)
    want = prover.prove_fs(params, witness, state, crs, decomp_mode=decomp)

    mesh = make_mesh(n_dp=1, n_rows=8)
    fn = make_sharded_prover(params, mesh, decomp_mode=decomp, oracle="fs")
    wit_b = witness[None]
    state_b = jax.tree.map(lambda x: x[None], state)
    got = fn(wit_b, state_b, crs.key[None], kv[None])
    _assert_transcripts_equal(got, want, 0)
    # and FS challenge provenance holds on the sharded transcript
    proof0 = jax.tree.map(lambda x: x[0], got)
    fs = verifier.fs_challenge_report(params, state, proof0, crs)
    failed = [k for k, v in fs.items() if not bool(np.asarray(v))]
    assert not failed, failed


def test_sharded_proof_verifies():
    witness, state, crs, kv = _setup(P_SMALL)
    mesh = make_mesh(n_dp=1, n_rows=8)
    fn = make_sharded_prover(P_SMALL, mesh)
    wit_b = witness[None]
    state_b = jax.tree.map(lambda x: x[None], state)
    proofs = fn(wit_b, state_b, crs.key[None], kv[None])
    proof0 = jax.tree.map(lambda x: x[0], proofs)
    rep = verifier.verify_report(P_SMALL, state, proof0, crs)
    failed = [k for k, v in rep.items() if not bool(v)]
    assert not failed, failed


def test_sharded_verifier_matches_single_chip():
    """Row-sharded checks 15/19/20 agree with the single-chip verifier on
    a valid proof AND locate the same failing check on a tampered one."""
    witness, state, crs, kv = _setup(P_SMALL, seed=77)
    proof = prover.prove(P_SMALL, witness, state, crs, kv)
    mesh = make_mesh(n_dp=1, n_rows=8)
    vfn = make_sharded_verifier(P_SMALL, mesh)

    rep_s = {k: bool(np.asarray(v))
             for k, v in vfn(state, proof, crs.key).items()}
    rep_1 = {k: bool(np.asarray(v))
             for k, v in verifier.verify_report(
                 P_SMALL, state, proof, crs).items()}
    assert rep_s == rep_1
    assert rep_s["all"]

    from labrador_tpu.ops.modmath import mod_pos
    bad = proof.replace(u_1=mod_pos(proof.u_1.at[3, 5].add(1), P_SMALL.q))
    rep_bad = {k: bool(np.asarray(v))
               for k, v in vfn(state, bad, crs.key).items()}
    assert not rep_bad["c19_u1"] and not rep_bad["all"]
    assert rep_bad["c20_u2"]


def test_sharded_verifier_bigq():
    witness, state, crs, kv = _setup(P_BIG, seed=88)
    proof = prover.prove(P_BIG, witness, state, crs, kv, decomp_mode="exact")
    mesh = make_mesh(n_dp=1, n_rows=8)
    vfn = make_sharded_verifier(P_BIG, mesh, decomp_mode="exact")
    rep = {k: bool(np.asarray(v))
           for k, v in vfn(state, proof, crs.key).items()}
    failed = [k for k, v in rep.items() if not v]
    assert not failed, failed
