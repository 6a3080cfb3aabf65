#!/usr/bin/env python
"""End-to-end prove+verify scaling bench — the analog of the reference's
``benches/labrador_perf.rs:11-49``: witness size sweeps 2^2 .. 2^max by
alternately doubling n and r, timing steady-state prove and verify at each
size.  Emits one JSON line per config.

Usage:
  python benchmarks/scaling.py --max-pow 14            # on TPU
  python benchmarks/scaling.py --max-pow 8 --cpu       # CPU smoke
  python benchmarks/scaling.py --max-pow 14 --kappa 256  # realistic rank

Note: with the reference's kappa = n*d rule the outer commitment is
quadratic in witness size (B matrices are (n*d)^2 ring elements) — exactly
why the reference's own bench stops being practical long before its
aspirational 2^20 (labrador_perf.rs:22).  --kappa bounds the rank for
large-scale runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-pow", type=int, default=10,
                    help="max log2 of total witness coefficients (r*n*d)")
    ap.add_argument("--min-pow", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kappa", type=int, default=0,
                    help="commitment-rank override (0 = reference n*d rule)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--config", type=int, nargs=2, metavar=("N", "R"),
                    default=None,
                    help="run ONE (n, r) config instead of the doubling "
                         "sweep (e.g. --config 512 32 for a 2^20 witness "
                         "with a smaller r^2 tail)")
    ap.add_argument("--phase-split", action="store_true",
                    help="prove via prove_checkpointed (3 smaller programs "
                         "instead of one monolith) — the 2^20 (128,128) "
                         "shape's single program SIGSEGVs the remote AOT "
                         "compile helper at ~150 MB (round-4 verdict 6)")
    ap.add_argument("--skip-verify", action="store_true",
                    help="prove-only row (when the verifier program itself "
                         "exceeds the remote compile helper)")
    ap.add_argument("--big-q", action="store_true",
                    help="2^32-scale modulus (q=4294967311, exact digits): "
                         "beta ~ 1.7e7 witnesses are genuinely norm-"
                         "realistic at EVERY size — the q=8191 rows above "
                         "2^12 halve to the zero witness (see PERF.md); "
                         "this is the BASELINE-config-3/4 evidence regime")
    args = ap.parse_args()

    if args.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    if args.cpu:
        # NOTE: the persistent compile cache hangs the axon TPU backend;
        # CPU only.  zlib-pinned — see utils/compile_cache docstring.
        from labrador_tpu.utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()

    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs, prover, verifier
    from labrador_tpu.crs import CRS
    from labrador_tpu.utils.profiling import wait_for

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

    n, r = 2, 2  # start at 2^2 ring elements * d coeffs
    results = []
    if args.config:
        configs = [tuple(args.config)]
    else:
        configs = []
        for _pow2 in range(2, args.max_pow - 5 + 1):
            configs.append((n, r))
            if _pow2 % 2 == 0:
                n *= 2
            else:
                r *= 2
    for pow2, (n, r) in enumerate(configs, start=2):
        total_coeffs = n * r * 64
        if total_coeffs.bit_length() - 1 > args.max_pow and not args.config:
            break
        if total_coeffs.bit_length() - 1 >= args.min_pow or args.config:
            extra = dict(q_start=(1 << 32) - 1, exact_digits=True) \
                if args.big_q else {}
            decomp = "exact" if args.big_q else "reference"
            p = LabradorParams(n=n, r=r, kappa_override=args.kappa, **extra)
            key = jax.random.key(pow2)
            kw, ks, kv = jax.random.split(key, 3)
            t0 = time.perf_counter()
            witness = sampling.generate_witness(kw, p)
            state = structs.generate_state(ks, witness, p)
            crs = CRS.create(p, seed=0xBE7C + pow2)
            if args.phase_split:
                do_prove = lambda vk: prover.prove_checkpointed(
                    p, witness, state, crs, vk, decomp_mode=decomp)
            else:
                do_prove = lambda vk: prover.prove(p, witness, state, crs,
                                                   vk, decomp_mode=decomp)
            proof = do_prove(kv)
            wait_for(proof)       # fetch — block_until_ready only acks
            compile_s = time.perf_counter() - t0   # enqueue on axon
            assert bool(proof.jl_ok) and bool(proof.b_pp_ok)
            if args.big_q:
                # the point of this regime: the witness must NOT be the
                # rejection-halved zero artifact of the q=8191 rows
                import numpy as np
                frac = float(np.mean(np.asarray(witness) != 0))
                assert frac > 0.5, f"witness degenerate ({frac:.2%} nonzero)"

            # rotate the verifier key per iteration: identical dispatches
            # can be deduped by the remote-TPU relay (~2x inflation).
            # Timing is enqueue-all -> fetch one small leaf PER dispatch
            # (each fetch forces that program's completion; the axon
            # relay's block_until_ready does not — utils/profiling).
            t0 = time.perf_counter()
            proofs = [do_prove(jax.random.fold_in(kv, i))
                      for i in range(args.iters)]
            for pf in proofs:
                wait_for(pf)
            t_prove = (time.perf_counter() - t0) / args.iters

            if args.skip_verify:
                ok, t_verify = None, float("nan")
            else:
                rep = verifier.verify_report(p, state, proof, crs,
                                             decomp_mode=decomp)
                wait_for(rep)
                ok = bool(rep["all"])
                t0 = time.perf_counter()
                reps = [verifier.verify_report(p, state, proofs[i], crs,
                                               decomp_mode=decomp)
                        for i in range(args.iters)]
                for rp in reps:
                    wait_for(rp)
                t_verify = (time.perf_counter() - t0) / args.iters

            size = structs.transcript_size_in_bytes(
                jax.device_get(proof), p.q)
            row = {
                "witness_coeffs": total_coeffs, "n": n, "r": r,
                "kappa": p.kappa, "q": p.q,
                "prove_ms": round(t_prove * 1e3, 2),
                "verify_ms": round(t_verify * 1e3, 2),
                "proof_kb": round(size / 1024, 1),
                "verified": ok, "first_run_s": round(compile_s, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
