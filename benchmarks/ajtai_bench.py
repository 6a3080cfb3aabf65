#!/usr/bin/env python
"""Fused Ajtai kernel vs XLA streamed path, one TPU chip.

Shape matches PERF.md's round-1 entry (kappa=2048, n=128, r=4) so the
numbers are directly comparable.  Distinct witnesses per iteration (the
axon relay dedupes repeated identical dispatches).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kappa", type=int, default=2048)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--r", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from labrador_tpu.params import LabradorParams
    from labrador_tpu.ops import ntt
    from labrador_tpu import sampling, protocol
    from labrador_tpu.crs import CRS
    from labrador_tpu.ops.ajtai_pallas import ajtai_commit_pallas
    from labrador_tpu.utils.profiling import wait_for

    p = LabradorParams(n=args.n, r=args.r, kappa_override=args.kappa)
    plan = ntt.plan_for(p)
    crs = CRS.create(p, seed=0xBE7C)
    # a DISTINCT witness for every timed iteration — the axon relay dedupes
    # repeated identical (program, args) dispatches (PERF.md methodology)
    keys = [jax.random.key(100 + i) for i in range(args.iters + 2)]
    ws = [sampling.generate_witness(k, p) for k in keys]
    print(f"shape: kappa={p.kappa} n={p.n} r={p.r} q={p.q} "
          f"primes={len(plan.primes)}", flush=True)

    @jax.jit
    def xla_path(crs, w):
        s_hat = ntt.ntt_fwd(w, plan)
        return protocol.ajtai_commit(crs, s_hat, p, plan)

    @jax.jit
    def pallas_path(key, w):
        return ajtai_commit_pallas(key, w, p, plan)

    t0 = time.time()
    r_x = xla_path(crs, ws[0])
    wait_for(r_x)                 # fetch-based (axon block == enqueue ack)
    print(f"xla compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    r_p = pallas_path(crs.key, ws[0])
    wait_for(r_p)
    print(f"pallas compile+run: {time.time()-t0:.1f}s", flush=True)
    import numpy as np
    np.testing.assert_array_equal(np.asarray(r_x), np.asarray(r_p))
    print("outputs bit-identical", flush=True)

    for name, f, arg0 in (("xla", xla_path, crs),
                          ("pallas", pallas_path, crs.key)):
        wait_for(f(arg0, ws[1]))  # warm
        t0 = time.perf_counter()
        outs = [f(arg0, ws[i % len(ws)]) for i in range(args.iters)]
        for o in outs:            # fetch one leaf per dispatch
            wait_for(o)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.2f} ms / commitment", flush=True)

    # ---- u1 (B-term dominant): full u1_from_digits, XLA vs fused --------
    t_digs = []
    for w in ws:
        s_hat = ntt.ntt_fwd(w, plan)
        t = protocol.ajtai_commit(crs, s_hat, p, plan)
        t_digs.append(protocol.decompose_t(t, p, "reference"))
        if len(t_digs) == 1:
            g = ntt.ntt_inv_modq(protocol.gram_hat(s_hat, plan), plan)
            g_dig = protocol.decompose_g(g, p, "reference")

    @jax.jit
    def u1_xla(crs, td):
        return protocol.u1_from_digits(crs, td, g_dig, p, plan)

    @jax.jit
    def u1_pal(crs, td):
        return protocol.u1_from_digits(crs, td, g_dig, p, plan,
                                       use_pallas=True)

    import numpy as np
    t0 = time.time()
    r_x = u1_xla(crs, t_digs[0])
    wait_for(r_x)
    print(f"u1 xla compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    r_p = u1_pal(crs, t_digs[0])
    wait_for(r_p)
    print(f"u1 pallas compile+run: {time.time()-t0:.1f}s", flush=True)
    np.testing.assert_array_equal(np.asarray(r_x), np.asarray(r_p))
    print("u1 outputs bit-identical", flush=True)
    for name, f in (("u1 xla", u1_xla), ("u1 pallas", u1_pal)):
        wait_for(f(crs, t_digs[1]))  # warm
        t0 = time.perf_counter()
        outs = [f(crs, t_digs[i % len(t_digs)]) for i in range(args.iters)]
        for o in outs:
            wait_for(o)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
