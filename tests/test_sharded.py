"""Sharded prover on the 8-virtual-device CPU mesh: the multi-chip path
must produce byte-identical transcripts to the single-chip prover."""

import numpy as np
import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs, prover, verifier
from labrador_tpu.crs import CRS
from labrador_tpu.parallel.mesh import make_mesh
from labrador_tpu.parallel.sharded import make_sharded_prover

P = LabradorParams(n=2, r=2)


def _setup():
    key = jax.random.key(5150)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, P)
    state = structs.generate_state(ks, witness, P)
    crs = CRS.create(P, seed=0x5EED)
    return witness, state, crs, kv


def test_sharded_matches_single_chip():
    witness, state, crs, kv = _setup()
    want = prover.prove(P, witness, state, crs, kv)

    mesh = make_mesh(n_dp=2, n_rows=4)
    fn = make_sharded_prover(P, mesh)
    B = 2
    wit_b = jnp.stack([witness] * B)
    state_b = jax.tree.map(lambda x: jnp.stack([x] * B), state)
    got = fn(wit_b, state_b, jnp.stack([crs.key] * B), jnp.stack([kv] * B))

    for name in ("u_1", "u_2", "t", "g", "h", "z", "c", "projection"):
        w = np.asarray(getattr(want, name))
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name)[b]), w, err_msg=name)


def test_sharded_proof_verifies():
    witness, state, crs, kv = _setup()
    mesh = make_mesh(n_dp=1, n_rows=8)
    fn = make_sharded_prover(P, mesh)
    wit_b = witness[None]
    state_b = jax.tree.map(lambda x: x[None], state)
    proofs = fn(wit_b, state_b, crs.key[None], kv[None])
    proof0 = jax.tree.map(lambda x: x[0], proofs)
    rep = verifier.verify_report(P, state, proof0, crs)
    failed = [k for k, v in rep.items() if not bool(v)]
    assert not failed, failed
