#!/usr/bin/env python
"""Big-q (2^32-scale modulus) prove+verify on the real TPU chip —
fetch-timed steady state (the CPU-only big-q evidence left a PERF gap)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs, prover, verifier
from labrador_tpu.crs import CRS
from labrador_tpu.oracle import InteractiveOracle
from labrador_tpu.utils.profiling import wait_for

p = LabradorParams(n=2, r=2, q_start=(1 << 32) - 1, kappa_override=16,
                   exact_digits=True)
print(f"devices={jax.devices()} q={p.q}", flush=True)
kw, ks, kv = jax.random.split(jax.random.key(3), 3)
w = sampling.generate_witness(kw, p)
st = structs.generate_state(ks, w, p)
crs = CRS.create(p, seed=0xB16B16)

t0 = time.perf_counter()
proof = prover.prove(p, w, st, crs, kv, decomp_mode="exact")
wait_for(proof)
print(f"prove compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
assert bool(proof.jl_ok) and bool(proof.b_pp_ok)

t0 = time.perf_counter()
proofs = [prover.prove(p, w, st, crs, jax.random.fold_in(kv, i),
                       decomp_mode="exact") for i in range(5)]
for pf in proofs:
    wait_for(pf)
t_prove = (time.perf_counter() - t0) / 5

t0 = time.perf_counter()
rep = verifier.verify_report(p, st, proof, crs, decomp_mode="exact")
wait_for(rep)
print(f"verify compile+first: {time.perf_counter()-t0:.1f}s "
      f"all={bool(np.asarray(rep['all']))}", flush=True)
t0 = time.perf_counter()
reps = [verifier.verify_report(p, st, proofs[i], crs, decomp_mode="exact")
        for i in range(5)]
for r in reps:
    wait_for(r)
t_verify = (time.perf_counter() - t0) / 5
size = structs.transcript_size_in_bytes(jax.device_get(proof), p.q)
print(f"bigq TPU: prove {t_prove*1e3:.1f} ms  verify {t_verify*1e3:.1f} ms  "
      f"proof {size/1024:.1f} KB", flush=True)
