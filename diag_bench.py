"""Diagnose axon-relay timing semantics + fused polymul throughput.

Findings feed PERF.md methodology: block_until_ready does not reliably
wait for execution on the axon backend, so all timings here are
enqueue->fetch of a tiny checksum, with several dispatches in flight to
amortize the tunnel RTT.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu.ops import ntt, ntt_pallas
from labrador_tpu.ops.modmath import mod_pos
import labrador_tpu.sampling as sampling

p = LabradorParams(n=2, r=2)
plan = ntt.plan_for(p)
BATCH = 65536


def make_run(scan_len, use_pallas, batch=BATCH):
    if use_pallas:
        mul = lambda a, b: ntt_pallas.negacyclic_polymul_pallas(a, b, plan)
    else:
        mul = lambda a, b: ntt.negacyclic_polymul(a, b, plan)

    def run(key):
        ka, kb = jax.random.split(key)
        a = sampling.uniform_zq(ka, (batch, p.d), p.q)
        b = sampling.uniform_zq(kb, (batch, p.d), p.q)

        def body(carry, _):
            aj = mod_pos(a ^ carry, p.q)
            out = mul(aj, b)
            return carry ^ out, None

        carry, _ = jax.lax.scan(body, jnp.zeros((batch, p.d), jnp.int32),
                                None, length=scan_len)
        return jnp.sum(carry, dtype=jnp.int64)  # tiny checksum

    return jax.jit(run)


def timed(f, n_dispatch, work):
    outs = [f(jax.random.key(1000 + i)) for i in range(n_dispatch)]
    _ = [np.asarray(o) for o in outs]            # full warm incl. fetch
    t0 = time.perf_counter()
    outs = [f(jax.random.key(i)) for i in range(n_dispatch)]
    sums = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    per = dt / n_dispatch
    print(f"  {n_dispatch} dispatches x {work:,} products: total {dt:.3f}s, "
          f"{per*1e3:.1f} ms/dispatch, {work/per/1e9:.3f} G products/s, "
          f"checksums {[int(s) for s in sums]}", flush=True)
    return per


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for scan_len, use_pallas in ((1, True), (64, True), (1024, True),
                                 (64, False)):
        label = "pallas" if use_pallas else "xla"
        print(f"scan_len={scan_len} ({label}):", flush=True)
        f = make_run(scan_len, use_pallas)
        timed(f, 4, BATCH * scan_len)


if __name__ == "__main__":
    main()
