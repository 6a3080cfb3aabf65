"""Microbenchmark primitive costs on the real chip (round 2: each dispatch
sized to >= ~300 ms of expected device work so the ~30 ms dispatch+fetch
overhead is noise).  Timings are enqueue->fetch (PERF.md methodology).
"""

import time
import numpy as np
import jax
import jax.numpy as jnp


def timed(make, work, label, n=2):
    f = jax.jit(make)
    _ = np.asarray(f(jax.random.key(99)))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(f(jax.random.key(i)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{label}: {dt*1e3:8.1f} ms  {work/dt/1e12:8.2f} T/s", flush=True)


def mm(M, K, N, dtype, acc, scan):
    dn = (((1,), (0,)), ((), ()))

    def make(key):
        ka, kb = jax.random.split(key)
        a = jax.random.randint(ka, (M, K), -100, 100, jnp.int32).astype(dtype)
        b = jax.random.randint(kb, (K, N), -100, 100, jnp.int32).astype(dtype)

        def body(carry, _):
            out = jax.lax.dot_general(a, b, dn, preferred_element_type=acc)
            if acc == jnp.int32:
                carry = carry ^ out
            else:
                carry = carry + out
            return carry, None

        z = jnp.zeros((M, N), acc)
        carry, _ = jax.lax.scan(body, z, None, length=scan)
        return jnp.sum(carry.astype(jnp.float32))

    timed(make, scan * M * K * N,
          f"dot {M}x{K}x{N} {dtype.__name__}->{acc.__name__} x{scan}")


def modop(M, N, p, scan):
    def make(key):
        x = jax.random.randint(key, (M, N), 0, 1 << 30, jnp.int32)

        def body(carry, _):
            return (carry + x) % p, None

        carry, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.int32),
                                None, length=scan)
        return jnp.sum(carry)

    timed(make, scan * M * N, f"mod{p} {M}x{N} int32 x{scan} (elems/s)")


def empty(scan):
    def make(key):
        x = jax.random.randint(key, (8, 128), 0, 100, jnp.int32)

        def body(carry, _):
            return carry + x, None

        carry, _ = jax.lax.scan(body, jnp.zeros((8, 128), jnp.int32),
                                None, length=scan)
        return jnp.sum(carry)

    timed(make, scan, f"empty scan x{scan} (steps/s)")


def main():
    print(f"devices: {jax.devices()}", flush=True)
    empty(8192)
    # big MXU shapes: true peak
    mm(8192, 512, 512, jnp.int8, jnp.int32, 4096)
    mm(8192, 512, 512, jnp.bfloat16, jnp.float32, 4096)
    # the kernel's shape: batch x (64, 64)
    mm(262144, 64, 64, jnp.int8, jnp.int32, 512)
    mm(262144, 64, 64, jnp.bfloat16, jnp.float32, 512)
    # lane-padded variant: N = 128
    mm(262144, 64, 128, jnp.int8, jnp.int32, 512)
    # mod cost at scale
    modop(8192, 512, 8191, 8192)


if __name__ == "__main__":
    main()
