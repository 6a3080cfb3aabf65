#!/usr/bin/env python
"""Where does the big-q prover's CPU jit time go? (ROADMAP §2b)

Splits trace (python) / lower (StableHLO) / compile (XLA) per phase and
prints HLO module sizes, so the compile-latency work targets the right
stage.  CPU backend only."""

import os
import sys
import time

os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    big = "--small" not in sys.argv
    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs, prover, verifier
    from labrador_tpu.crs import CRS
    from labrador_tpu.oracle import InteractiveOracle

    kw_p = dict(q_start=(1 << 32) - 1, kappa_override=16,
                exact_digits=True) if big else {}
    p = LabradorParams(n=2, r=2, **kw_p)
    print(f"q={p.q} primes=?", flush=True)
    key = jax.random.key(5)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, p)
    state = structs.generate_state(ks, witness, p)
    crs = CRS.create(p, seed=0xD1A6)
    mode = "exact" if big else "reference"

    def prove_fn(w, vkey):
        return prover.prove_impl(p, w, state, crs,
                                 InteractiveOracle(vkey=vkey),
                                 decomp_mode=mode, kernel_backend="xla")

    def verify_fn(pf):
        return verifier.verify_report_impl(p, state, pf, crs,
                                           decomp_mode=mode)

    t0 = time.perf_counter()
    traced = jax.jit(prove_fn).trace(witness, kv)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    txt = lowered.as_text()
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"prove: trace {t_trace:.1f}s lower {t_lower:.1f}s "
          f"compile {t_compile:.1f}s hlo {len(txt)/1e6:.1f} MB "
          f"lines {txt.count(chr(10))}", flush=True)

    proof = prove_fn(witness, kv)
    t0 = time.perf_counter()
    traced = jax.jit(verify_fn).trace(proof)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    txt = lowered.as_text()
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"verify: trace {t_trace:.1f}s lower {t_lower:.1f}s "
          f"compile {t_compile:.1f}s hlo {len(txt)/1e6:.1f} MB "
          f"lines {txt.count(chr(10))}", flush=True)


if __name__ == "__main__":
    main()
