"""Demo CLI: end-to-end prove + verify, mirroring the reference binary
(``/root/reference/src/main.rs:44-116``).

Usage:
    python -m labrador_tpu.cli [--verbose] [--n N] [--r R] [--cpu] [--seed S]

The reference's ``--ntt`` flag has no analog: the CRT-NTT path is the only
multiplication path (the schoolbook lives on as the test oracle in
utils/golden.py).  ``--recursion`` arrives with the recursion module.
"""

from __future__ import annotations

import argparse
import time


def print_constants(p) -> None:
    """Mirror of ``print_constants`` (main.rs:10-24)."""
    print("Printing runtime-computed constants:")
    print(f"Q: {p.q}")
    print(f"BETA: {p.beta_bound}")
    print(f"STD: {p.std}")
    print(f"B: {p.b}")
    print(f"B_1: {p.b_1}")
    print(f"B_2: {p.b_2}")
    print(f"T_1: {p.t_1}")
    print(f"T_2: {p.t_2}")
    print(f"GAMMA: {p.gamma}")
    print(f"GAMMA_1: {p.gamma_1}")
    print(f"GAMMA_2: {p.gamma_2}")
    print(f"BETA_PRIME: {p.beta_prime}")
    print(f"CRT primes: {p.crt_primes}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="TPU-native LaBRADOR proof system (demo flow)")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--n", type=int, default=2, help="witness rank n")
    ap.add_argument("--r", type=int, default=2, help="witness count r")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from .params import LabradorParams
    from . import sampling, structs, prover, verifier
    from .crs import CRS

    p = LabradorParams(n=args.n, r=args.r)
    if args.verbose:
        print("Welcome to the LaBRADOR Proof System (TPU edition)!")
        print("=====================================\n")
        print_constants(p)
        print("Generating Witness Matrix")

    key = jax.random.key(args.seed)
    kw, ks, kv = jax.random.split(key, 3)

    t0 = time.time()
    witness = sampling.generate_witness(kw, p)
    if args.verbose:
        print(f"witness generated ({time.time()-t0:.2f}s)")
        print("Generating Common Reference String (CRS)")
    crs = CRS.create(p, seed=args.seed * 0x9E3779B97F4A7C15 % 2**64)
    if args.verbose:
        print("Generating State")
    state = structs.generate_state(ks, witness, p)

    if args.verbose:
        print("Generating proof..")
    t1 = time.time()
    proof = prover.prove(p, witness, state, crs, kv)
    proof = jax.block_until_ready(proof)
    t_prove = time.time() - t1
    assert bool(proof.jl_ok), "JL projection failed after max retries"
    assert bool(proof.b_pp_ok), "b'' constant-term self-check failed"
    if args.verbose:
        print(f"Generated proof! ({t_prove:.2f}s incl. compile)")
        print("Verifying proof..")

    t2 = time.time()
    res = verifier.verify(p, state, proof, crs)
    t_verify = time.time() - t2
    if not res:
        print("Error: Proof Verification Failed")
        return 1
    if args.verbose:
        print("Success: Proof Verified!")
        print("=========================")
        size = structs.transcript_size_in_bytes(jax.device_get(proof), p.q)
        print(f"Size of proof: {size / 1024:.2f} KB")
        print(f"prove: {t_prove:.2f}s  verify: {t_verify:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
