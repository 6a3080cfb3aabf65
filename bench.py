#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json config 2): batched Rq negacyclic polymul
throughput via the CRT-NTT MXU path, 10^5 products of degree-64 polys —
the TPU analog of the reference's ``benches/ntt_speed.rs``.

vs_baseline compares against the frozen single-host CPU number in
``bench_baseline.json`` (measured once with --calibrate on this container's
CPU backend, standing in for the reference's unpublished CPU numbers — see
BASELINE.md: the reference publishes no results).

Extra metrics (prove/verify wall clock, proof size) go to stderr so the
driver still sees exactly one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _stderr(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_polymul(batch: int = 100_000, iters: int = 20,
                  use_pallas: bool = False) -> float:
    """Rq polymul ops/s (steady state, compile excluded)."""
    import jax
    import jax.numpy as jnp
    from labrador_tpu.params import LabradorParams
    from labrador_tpu.ops import ntt

    p = LabradorParams(n=2, r=2)
    plan = ntt.plan_for(p)
    key = jax.random.key(0)
    import labrador_tpu.sampling as sampling
    a = sampling.uniform_zq(key, (batch, p.d), p.q)
    b = sampling.uniform_zq(jax.random.fold_in(key, 1), (batch, p.d), p.q)

    if use_pallas:
        from labrador_tpu.ops import ntt_pallas
        f = jax.jit(lambda a, b: ntt_pallas.negacyclic_polymul_pallas(
            a, b, plan))
    else:
        f = jax.jit(lambda a, b: ntt.negacyclic_polymul(a, b, plan))
    # distinct input pairs per iteration so no layer (XLA, runtime relays)
    # can dedupe repeated identical computations
    pairs = [(a, b)] + [
        (sampling.uniform_zq(jax.random.fold_in(key, 10 + i), (batch, p.d), p.q),
         sampling.uniform_zq(jax.random.fold_in(key, 20 + i), (batch, p.d), p.q))
        for i in range(3)]
    r = f(a, b)
    jax.block_until_ready(r)  # compile + warm
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        ai, bi = pairs[i % len(pairs)]
        outs.append(f(ai, bi))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def bench_e2e(n: int = 2, r: int = 2, iters: int = 3) -> dict:
    """Full prove+verify wall clock (steady state) + proof size."""
    import jax
    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs, prover, verifier
    from labrador_tpu.crs import CRS

    p = LabradorParams(n=n, r=r)
    key = jax.random.key(7)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, p)
    state = structs.generate_state(ks, witness, p)
    crs = CRS.create(p, seed=0x1234_5678_9ABC_DEF0)

    proof = jax.block_until_ready(prover.prove(p, witness, state, crs, kv))
    rep = jax.block_until_ready(verifier.verify_report(p, state, proof, crs))
    assert bool(rep["all"]), "bench proof failed verification"

    t0 = time.perf_counter()
    for _ in range(iters):
        proof = prover.prove(p, witness, state, crs, kv)
    jax.block_until_ready(proof)
    t_prove = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        rep = verifier.verify_report(p, state, proof, crs)
    jax.block_until_ready(rep["all"])
    t_verify = (time.perf_counter() - t0) / iters

    size = structs.transcript_size_in_bytes(jax.device_get(proof), p.q)
    return {"prove_s": t_prove, "verify_s": t_verify,
            "proof_kb": size / 1024.0}


def bench_batch_prove(batch: int = 16, n: int = 2, r: int = 2,
                      iters: int = 5) -> float:
    """Proofs/s for a vmapped batch of independent instances on one chip —
    the serving-throughput number (distinct witnesses, states, CRS seeds)."""
    import jax
    import jax.numpy as jnp
    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs
    from labrador_tpu.crs import CRS
    from labrador_tpu.prover import prove_impl
    from labrador_tpu.oracle import InteractiveOracle

    p = LabradorParams(n=n, r=r)
    keys = jax.random.split(jax.random.key(3), batch * 3).reshape(batch, 3)
    wit = jnp.stack([sampling.generate_witness(k[0], p) for k in keys])
    states = [structs.generate_state(keys[i][1], wit[i], p)
              for i in range(batch)]
    state_b = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    crs_keys = jnp.stack([CRS.create(p, seed=1000 + i).key
                          for i in range(batch)])
    vkeys = jnp.stack([keys[i][2] for i in range(batch)])

    def one(w, st, ck, vk):
        crs = CRS(key=ck, params=p)
        return prove_impl(p, w, st, crs, InteractiveOracle(vkey=vk))

    f = jax.jit(jax.vmap(one))
    out = f(wit, state_b, crs_keys, vkeys)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(f(wit, state_b, crs_keys,
                      jax.vmap(lambda k: jax.random.fold_in(k, i))(vkeys)))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small batch / skip e2e (CI smoke)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--calibrate", action="store_true",
                    help="write bench_baseline.json from this run (CPU)")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="force the fused Pallas polymul kernel")
    ap.add_argument("--no-pallas", action="store_true",
                    help="force the plain XLA polymul path")
    ap.add_argument("--batch-prove", type=int, default=0, metavar="B",
                    help="also measure vmapped proofs/s at batch B")
    ap.add_argument("--phases", action="store_true",
                    help="also report per-phase prover timings "
                         "(phase-dispatched, steady state)")
    args = ap.parse_args()

    if args.cpu or args.calibrate:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    _stderr(f"devices: {jax.devices()}")

    batch = 10_000 if args.quick else 100_000
    iters = 3 if args.quick else 20
    # default: fused Pallas kernel on real TPUs, XLA path elsewhere
    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = (args.pallas or on_tpu) and not args.no_pallas
    ops = bench_polymul(batch=batch, iters=iters, use_pallas=use_pallas)
    _stderr(f"polymul ({'pallas' if use_pallas else 'xla'}): "
            f"{ops:,.0f} ops/s (batch={batch})")

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if args.calibrate:
        with open(base_path, "w") as f:
            json.dump({"rq_ntt_polymul_ops_per_s_cpu": ops,
                       "note": "single-host CPU backend, this container"},
                      f, indent=1)
        _stderr(f"baseline written to {base_path}")

    vs = 0.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            vs = ops / json.load(f)["rq_ntt_polymul_ops_per_s_cpu"]

    # the required single JSON line goes out BEFORE the (compile-heavy)
    # e2e section so a timeout there cannot eat the headline metric
    print(json.dumps({
        "metric": "rq_ntt_polymul_ops_per_s",
        "value": round(ops, 1),
        "unit": "ops/s",
        "vs_baseline": round(vs, 3),
    }), flush=True)

    if not (args.quick or args.skip_e2e):
        e2e = bench_e2e()
        _stderr(f"e2e prove: {e2e['prove_s']*1e3:.1f} ms, "
                f"verify: {e2e['verify_s']*1e3:.1f} ms, "
                f"proof: {e2e['proof_kb']:.1f} KB")

    if args.batch_prove:
        pps = bench_batch_prove(batch=args.batch_prove)
        _stderr(f"batched prover throughput: {pps:.1f} proofs/s "
                f"(batch={args.batch_prove})")

    if args.phases:
        timings = bench_phases()
        _stderr("per-phase prover timings (steady state): " +
                ", ".join(f"{k}={v*1e3:.1f}ms" for k, v in timings.items()))


def bench_phases(n: int = 2, r: int = 2, iters: int = 3) -> dict:
    """Per-phase prover wall clock via the phase-dispatched runner
    (SURVEY.md §5.1 — structured per-phase metrics in runs)."""
    import jax
    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs, prover
    from labrador_tpu.crs import CRS
    from labrador_tpu.utils.profiling import PhaseTimer

    p = LabradorParams(n=n, r=r)
    key = jax.random.key(11)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, p)
    state = structs.generate_state(ks, witness, p)
    crs = CRS.create(p, seed=0xBEEF)
    prover.prove_checkpointed(p, witness, state, crs, kv)  # compile
    timer = PhaseTimer()
    for i in range(iters):
        prover.prove_checkpointed(p, witness, state, crs,
                                  jax.random.fold_in(kv, i), timer=timer)
    return {k: v / iters for k, v in timer.phases.items()}


if __name__ == "__main__":
    main()
