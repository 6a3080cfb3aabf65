#!/usr/bin/env python
"""Recursion size/time accounting (BASELINE config 5 structure).

Folds a base proof into a structured recursive instance and reports base
vs folded proof sizes and prove/verify wall-clock at each level.  One JSON
line per level.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--r", type=int, default=16)
    ap.add_argument("--kappa", type=int, default=256)
    ap.add_argument("--kappa-new", type=int, nargs="+", default=[16])
    ap.add_argument("--mu", type=int, nargs="+", default=[8])
    ap.add_argument("--levels", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--big-q", action="store_true",
                    help="2^32-scale modulus (two-limb Zq2 pipeline)")
    args = ap.parse_args()
    if args.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
        from labrador_tpu.utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()
    import jax
    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs, prover, verifier, recursion
    from labrador_tpu.crs import CRS
    from labrador_tpu.utils.profiling import wait_for

    kw = dict(q_start=(1 << 32) - 1) if args.big_q else {}
    p = LabradorParams(n=args.n, r=args.r, kappa_override=args.kappa,
                       exact_digits=True, **kw)
    key = jax.random.key(1)
    kw, ks, kv = jax.random.split(key, 3)
    w = sampling.generate_witness(kw, p)
    state = structs.generate_state(ks, w, p)
    crs = CRS.create(p, seed=0x512E)

    t0 = time.time()
    proof = prover.prove(p, w, state, crs, kv, decomp_mode="exact")
    wait_for(proof)               # fetch-based (axon block == enqueue ack)
    t_prove = time.time() - t0
    got = jax.device_get(proof)
    size = structs.transcript_size_in_bytes(got, p.q)
    size_fs = structs.transcript_size_in_bytes(got, p.q, fs=True)
    print(json.dumps(dict(level=0, n=p.n, r=p.r, kappa=p.kappa,
                          witness_coeffs=p.n * p.r * p.d,
                          proof_kb=round(size / 1024, 1),
                          fs_proof_kb=round(size_fs / 1024, 1),
                          prove_s=round(t_prove, 2))), flush=True)

    # (mu, kappa') sweep from the SAME base proof: locates the size-vs-
    # parameter optimum without re-proving/recompiling the base per cell.
    # Multi-level folding follows the FIRST (mu, kappa') combination.
    import itertools
    combos = list(itertools.product(args.mu, args.kappa_new))
    for ci, (mu, kappa_new) in enumerate(combos):
        p1, state1, proof1, crs1 = p, state, proof, crs
        for lvl in range(1, args.levels + 1):
            t0 = time.time()
            p2, w2, st2, lay = recursion.fold(p1, state1, proof1, crs1,
                                              mu=mu, kappa_new=kappa_new)
            wait_for((w2, st2))
            t_fold = time.time() - t0
            crs2 = CRS.create(p2, seed=0xF01D + lvl)
            t0 = time.time()
            try:
                # phase-split (3 smaller programs): the monolithic folded
                # prove at kappa>=256 bases OOMs the remote AOT compile
                # helper (same class as the 2^20 (128,128) shape)
                proof2 = prover.prove_checkpointed(
                    p2, w2, st2, crs2, jax.random.fold_in(kv, 16 * ci + lvl),
                    decomp_mode="exact")
            except Exception as e:
                print(json.dumps(dict(
                    level=lvl, mu=mu, kappa_new=kappa_new, n=p2.n, r=p2.r,
                    error=f"{type(e).__name__}: {str(e)[:200]}")),
                    flush=True)
                break
            wait_for(proof2)
            t_prove2 = time.time() - t0
            assert bool(proof2.jl_ok) and bool(proof2.b_pp_ok)
            t0 = time.time()
            try:
                rep = verifier.verify_report(p2, st2, proof2, crs2,
                                             decomp_mode="exact")
                wait_for(rep)
                ok = bool(rep["all"])
            except Exception as e:
                ok = f"verify-compile-failed: {type(e).__name__}"
            t_verify2 = time.time() - t0
            got2 = jax.device_get(proof2)
            size2 = structs.transcript_size_in_bytes(got2, p2.q)
            size2_fs = structs.transcript_size_in_bytes(got2, p2.q, fs=True)
            print(json.dumps(dict(
                level=lvl, mu=mu, kappa_new=kappa_new,
                n=p2.n, r=p2.r, k_families=p2.k_count,
                witness_coeffs=p2.n * p2.r * p2.d,
                proof_kb=round(size2 / 1024, 1),
                fs_proof_kb=round(size2_fs / 1024, 1),
                fold_s=round(t_fold, 2),
                prove_s=round(t_prove2, 2), verify_s=round(t_verify2, 2),
                verified=ok)), flush=True)
            p1, state1, proof1, crs1 = p2, st2, proof2, crs2


if __name__ == "__main__":
    main()
