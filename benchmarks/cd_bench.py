#!/usr/bin/env python
"""Fused C/D-term kernel (ops/cd_pallas) vs the XLA batched sum, one chip.

Benches u2 = sum_{i<=j,k} D_ijk h_ij^{(k)} — the outer-commitment tail that
grows with r^2 (the 2^20 config has 8256 triangle pairs).  Distinct digit
streams per iteration (the axon relay dedupes identical dispatches).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kappa", type=int, default=256)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--r", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from labrador_tpu.params import LabradorParams
    from labrador_tpu.ops import ntt
    from labrador_tpu import protocol
    from labrador_tpu.crs import CRS

    p = LabradorParams(n=args.n, r=args.r, kappa_override=args.kappa)
    plan = ntt.plan_for(p)
    crs = CRS.create(p, seed=0xD0D0)
    n_tri = p.r * (p.r + 1) // 2
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    print(f"r={p.r} tri={n_tri} t1={p.t_1} b1={p.b_1} kappa_2={p.kappa_2} "
          f"L={n_tri * p.t_1}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(5)
    half = p.b_1 // 2

    def mk_h_dig(i):
        d = rng.integers(-half, half + 1, (p.t_1, p.r, p.r, p.d))
        d = (d + d.transpose(0, 2, 1, 3)) // 2          # symmetric like h
        return jnp.asarray(np.mod(d, p.q), jnp.int32)

    # distinct stream per timed iteration (relay dedupe — PERF.md)
    digs = [mk_h_dig(i) for i in range(args.iters + 1)]

    from labrador_tpu.utils.profiling import wait_for

    fx = jax.jit(lambda h: protocol.u2_from_digits(crs, h, p, plan))
    fp = jax.jit(lambda h: protocol.u2_from_digits(crs, h, p, plan,
                                                   use_pallas=True))
    wx = np.asarray(fx(digs[0]))   # fetch: axon block == enqueue ack
    wp = np.asarray(fp(digs[0]))
    assert np.array_equal(wx, wp), "parity failure"

    for name, f in (("xla", fx), ("pallas", fp)):
        t0 = time.perf_counter()
        outs = [f(digs[i % len(digs)]) for i in range(args.iters)]
        for o in outs:             # fetch one leaf per dispatch
            wait_for(o)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt * 1e3:.2f} ms / u2", flush=True)


if __name__ == "__main__":
    main()
