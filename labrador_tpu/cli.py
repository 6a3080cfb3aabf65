"""Demo CLI: end-to-end prove + verify, mirroring the reference binary
(``/root/reference/src/main.rs:44-116``).

Usage:
    python -m labrador_tpu.cli [--verbose] [--n N] [--r R] [--cpu] [--seed S]

The reference's ``--ntt`` flag has no analog: the CRT-NTT path is the only
multiplication path (the schoolbook lives on as the test oracle in
utils/golden.py).  ``--recursion`` actually works here — unlike the
reference, which parses the flag and ignores it (main.rs:41, recursion.rs).
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
    ap.add_argument("--fs", action="store_true",
                    help="non-interactive (Fiat-Shamir) mode")
    ap.add_argument("-R", "--recursion", action="store_true",
                    help="fold the proof into a recursive instance and "
                         "prove+verify that too")
    ap.add_argument("--kappa", type=int, default=0,
                    help="override the commitment rank (0 = reference n*d)")
    ap.add_argument("--big-q", action="store_true",
                    help="2^32-scale modulus (q = 4294967311, the "
                         "constants.rs:196 configuration the reference "
                         "cannot run; two-limb exact arithmetic)")
    ap.add_argument("--phases", action="store_true",
                    help="phase-dispatched proving with a per-phase timer "
                         "report (utils.profiling.PhaseTimer)")
    ap.add_argument("--ckpt", type=str, default="",
                    help="checkpoint path: persist each proving phase and "
                         "resume from the last completed one (implies "
                         "--phases)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from .params import LabradorParams
    from . import sampling, structs, prover, verifier
    from .crs import CRS

    q_start = (1 << 32) - 1 if args.big_q else 0
    p = LabradorParams(n=args.n, r=args.r, kappa_override=args.kappa,
                       exact_digits=args.recursion or args.big_q,
                       **({"q_start": q_start} if q_start else {}))
    decomp_mode = "exact" if (args.recursion or args.big_q) else "reference"
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
    timer = None
    if args.fs:
        proof = prover.prove_fs(p, witness, state, crs,
                                decomp_mode=decomp_mode)
    elif args.phases or args.ckpt:
        from .utils.profiling import PhaseTimer
        timer = PhaseTimer()
        proof = prover.prove_checkpointed(p, witness, state, crs, kv,
                                          ckpt_path=args.ckpt or None,
                                          decomp_mode=decomp_mode,
                                          timer=timer)
    else:
        proof = prover.prove(p, witness, state, crs, kv,
                             decomp_mode=decomp_mode)
    proof = jax.block_until_ready(proof)
    t_prove = time.time() - t1
    if timer is not None and args.verbose:
        print("Per-phase prover timings (incl. per-phase compile):")
        print(timer.report())
    assert bool(proof.jl_ok), "JL projection failed after max retries"
    assert bool(proof.b_pp_ok), "b'' constant-term self-check failed"
    if args.verbose:
        print(f"Generated proof! ({t_prove:.2f}s incl. compile)")
        print("Verifying proof..")

    t2 = time.time()
    if args.fs:
        res = verifier.verify_fs(p, state, proof, crs,
                                 decomp_mode=decomp_mode)
    else:
        res = verifier.verify(p, state, proof, crs, decomp_mode=decomp_mode)
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

    if args.recursion:
        from . import recursion
        if args.verbose:
            print("Folding proof into a recursive instance (structured)..")
        t3 = time.time()
        p2, w2, s2, layout = recursion.fold(p, state, proof, crs)
        res2 = int(recursion.folded_residual(s2, w2, p2))
        assert res2 == 0, "folded relation does not hold"
        crs2 = CRS.create(p2, seed=args.seed ^ 0xF01D)
        kv2 = jax.random.fold_in(kv, 1)
        proof2 = prover.prove(p2, w2, s2, crs2, kv2, decomp_mode="exact")
        proof2 = jax.block_until_ready(proof2)
        assert bool(proof2.jl_ok) and bool(proof2.b_pp_ok)
        rep2 = verifier.verify_report(p2, s2, proof2, crs2,
                                      decomp_mode="exact")
        if not bool(rep2["all"]):
            failed = [k for k, v in rep2.items() if not bool(v)]
            print(f"Error: recursive proof failed verification: {failed}")
            return 1
        if args.verbose:
            size2 = structs.transcript_size_in_bytes(
                jax.device_get(proof2), p2.q)
            base_size = structs.transcript_size_in_bytes(
                jax.device_get(proof), p.q)
            print(f"Recursive instance: n'={p2.n} r'={p2.r} "
                  f"k'={p2.k_count} (folded in {time.time()-t3:.2f}s)")
            print(f"Proof size: base {base_size / 1024:.2f} KB -> "
                  f"folded {size2 / 1024:.2f} KB")
            print("Success: recursive proof verified!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
