#!/usr/bin/env python
"""Matched proof-size comparison vs the reference's serialization
mechanism (round-3 verdict item 8).

The reference reports proof size as ``gzip(bincode(Transcript))``
(``/root/reference/src/structs.rs:212-221``); this framework reproduces
that byte layout in ``structs.transcript_size_in_bytes``.  The only
cross-implementation scalar that can be checked without a Rust toolchain
is: serialize the SAME transcript through both producers' fields and
compare.  Here, at the reference ``main.rs`` demo config (n=2, r=2,
q=8191) on ChaCha-identical CRS coefficients:

  * ``framework`` — the TPU pipeline's proof, serialized by
    ``transcript_size_in_bytes``;
  * ``refsim``    — the reference-semantics scalar simulator's proof
    (``utils/refsim.py``: proofgen.rs transliterated) for the same
    witness/state/CRS/challenges, pushed through the same bincode+gzip
    layout.

Because transcript parity holds field-by-field (tests/test_refsim_parity),
the two serializations must agree byte-for-byte; the JSON output records
both sizes and the delta as committed evidence.  One JSON line on stdout.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np
    import jax.numpy as jnp
    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs, prover
    from labrador_tpu.crs import MaterializedCRS
    from labrador_tpu.utils import refsim
    from labrador_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    p = LabradorParams(n=2, r=2)          # main.rs demo config, q = 8191
    crs = MaterializedCRS.create_chacha(p, bytes(range(32)))
    key = jax.random.key(20240807)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, p)
    state = structs.generate_state(ks, witness, p)
    proof = prover.prove(p, witness, state, crs, kv)
    assert bool(proof.jl_ok) and bool(proof.b_pp_ok)

    size_fw = structs.transcript_size_in_bytes(jax.device_get(proof), p.q)

    # reference-semantics transcript for the identical inputs/challenges
    chal = refsim.extract_challenges(proof)
    ref = refsim.ref_prove(p, np.asarray(witness), state, crs, chal)
    ref_tr = proof.replace(**{f: jnp.asarray(ref[f], jnp.int32)
                              for f in ("t", "g", "u_1", "projection",
                                        "b_prime_prime", "h", "u_2", "z")})
    size_ref = structs.transcript_size_in_bytes(jax.device_get(ref_tr), p.q)

    print(json.dumps({
        "config": {"n": p.n, "r": p.r, "q": p.q, "kappa": p.kappa},
        "framework_gzip_bincode_bytes": size_fw,
        "refsim_gzip_bincode_bytes": size_ref,
        "delta_bytes": size_fw - size_ref,
    }), flush=True)


if __name__ == "__main__":
    main()
