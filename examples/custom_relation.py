#!/usr/bin/env python
"""Example: prove YOUR OWN dot-product relation (not the random demo one).

The principal relation (LaBRADOR §3) over witness vectors s_1..s_r of ring
elements is

    f(s) = sum_ij a_ij <s_i, s_j> + sum_i <phi_i, s_i> - b = 0 .

You supply a_k (quadratic coefficients) and phi_k (linear coefficients);
`state_from_constraints` derives b so the relation holds for your witness,
and the standard pipeline proves/verifies it.

Run:  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/custom_relation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu import prover, verifier, structs
from labrador_tpu.crs import CRS


def main():
    p = LabradorParams(n=4, r=2, kappa_override=32)
    d, q = p.d, p.q

    # --- your secret witness: r vectors of n ring elements each.
    # Keep its norm within beta (= params.beta_bound): binary coefficients
    # give norm^2 <= r*n*d = 512 < beta^2 = 961 here.
    key = jax.random.key(0)
    witness = jax.random.randint(key, (p.r, p.n, d), 0, 2, dtype=jnp.int32)

    # --- your relation: here, one family asserting
    #     <s_0, s_1> + <phi_0, s_0> = b     (a_01 = a_10 = 1, phi random-ish)
    a_k = jnp.zeros((1, p.r, p.r, d), jnp.int32)
    one = jnp.zeros((d,), jnp.int32).at[0].set(1)
    a_k = a_k.at[0, 0, 1].set(one).at[0, 1, 0].set(one)   # symmetric
    phi_k = jnp.zeros((1, p.r, p.n, d), jnp.int32)
    phi_k = phi_k.at[0, 0, :, 0].set(jnp.arange(p.n) % q)

    state = structs.state_from_constraints(a_k, phi_k, witness, p)
    print(f"relation target b(0) = {int(state.b_prime_k[0])}")

    # --- prove + verify (non-interactive)
    crs = CRS.create(p, seed=0xD07)
    proof = prover.prove_fs(p, witness, state, crs)
    assert bool(proof.jl_ok) and bool(proof.b_pp_ok)
    ok = verifier.verify_fs(p, state, proof, crs)
    size = structs.transcript_size_in_bytes(jax.device_get(proof), q)
    print(f"verified: {ok}; proof size: {size/1024:.1f} KB")
    assert ok


if __name__ == "__main__":
    main()
