#!/usr/bin/env python
"""Rows-axis scaling of the sharded prover (BASELINE config 4 structure).

Runs the SAME proof instance through ``parallel.sharded.make_sharded_prover``
on (dp=1, rows=R) meshes for R in ``--rows-list``, timing steady-state prove
at each R and checking the transcript stays byte-identical to the
single-chip prover.  One JSON line per mesh.

On this container only the 8-virtual-device CPU mesh is available
(``--xla_force_host_platform_device_count``); all R virtual devices share
one host's cores, so wall-clock "efficiency" here measures collective/
partitioning overhead (a lower bound on real-pod efficiency), not an
R-times-the-silicon speedup — real multi-chip numbers need a pod slice
(ROADMAP.md item 3).  The thing this harness *does* establish on real
hardware is that the rows decomposition is sound at scale: per-device CRS
tiles + one psum per reduction, transcripts bit-equal at every R.

Usage:
  python benchmarks/sharded_scaling.py --n 8 --r 8 --kappa 256
  python benchmarks/sharded_scaling.py --n 128 --r 64 --kappa 256 --rows-list 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--kappa", type=int, default=256)
    ap.add_argument("--rows-list", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-parity", action="store_true",
                    help="skip the single-chip transcript diff (saves one "
                         "unsharded compile at large configs)")
    args = ap.parse_args()

    from labrador_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np
    from labrador_tpu.params import LabradorParams
    from labrador_tpu import sampling, structs, prover
    from labrador_tpu.crs import CRS
    from labrador_tpu.ops import zq
    from labrador_tpu.parallel.mesh import make_mesh
    from labrador_tpu.parallel.sharded import make_sharded_prover

    p = LabradorParams(n=args.n, r=args.r, kappa_override=args.kappa)
    print(f"# devices: {len(jax.devices())}, witness_coeffs="
          f"{p.n * p.r * p.d}, kappa={p.kappa}", file=sys.stderr, flush=True)

    key = jax.random.key(17)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, p)
    state = structs.generate_state(ks, witness, p)
    crs = CRS.create(p, seed=0x40D5)

    want = None
    if not args.skip_parity:
        want = prover.prove(p, witness, state, crs, kv)

    wit_b = jnp.stack([witness])
    state_b = jax.tree.map(lambda x: jnp.stack([x]), state)
    crs_b = jnp.stack([crs.key])

    base_ms = None
    for rows in args.rows_list:
        if p.kappa % rows:
            print(f"# skip rows={rows}: kappa={p.kappa} not divisible",
                  file=sys.stderr, flush=True)
            continue
        mesh = make_mesh(n_dp=1, n_rows=rows)
        fn = make_sharded_prover(p, mesh)
        t0 = time.perf_counter()
        got = jax.block_until_ready(fn(wit_b, state_b, crs_b,
                                       jnp.stack([kv])))
        compile_s = time.perf_counter() - t0
        if want is not None:
            # full message-field surface — same constant the test suite's
            # byte-parity assertions use (tests/test_sharded.py)
            for name in structs.TRANSCRIPT_FIELDS:
                np.testing.assert_array_equal(
                    zq.to_py(zq.index(getattr(got, name), 0)),
                    zq.to_py(getattr(want, name)), err_msg=name)
        t0 = time.perf_counter()
        outs = [fn(wit_b, state_b, crs_b,
                   jnp.stack([jax.random.fold_in(kv, i)]))
                for i in range(args.iters)]
        jax.block_until_ready(outs)
        t_prove = (time.perf_counter() - t0) / args.iters
        ms = t_prove * 1e3
        if base_ms is None:
            base_ms, base_rows = ms, rows
        # ideal linear scaling from the first measured mesh size
        eff = (base_ms * base_rows / rows) / ms if ms else 0.0
        row_out = {
            "rows": rows, "prove_ms": round(ms, 1),
            "eff_vs_linear": round(eff, 3),
            "first_run_s": round(compile_s, 1),
        }
        if want is not None:      # parity asserted above (raises on diff)
            row_out["parity_checked"] = True
        print(json.dumps(row_out), flush=True)


if __name__ == "__main__":
    main()
