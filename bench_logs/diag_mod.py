#!/usr/bin/env python
"""On-chip diagnosis: is the polymul kernel VPU-bound on int32 `%`?

Variants (same dot structure, BLOCK=1024, small q plan):
  dots   — int8 MXU dots only, no modular reduction (ceiling)
  rem    — current kernel (jnp `%` everywhere)
  barrett— two-step float32 Barrett replacing every `%`
  xla    — ops/ntt.negacyclic_polymul (XLA path, jnp.remainder)
  xlab   — XLA path with mod_pos monkeypatched to float Barrett
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from labrador_tpu.params import LabradorParams
from labrador_tpu.ops import ntt, ntt_pallas
from labrador_tpu.ops import modmath
import labrador_tpu.sampling as sampling

BATCH, SCAN, ITERS = 65536, 256, 3
p_ = LabradorParams(n=2, r=2)
plan = ntt.plan_for(p_)
D = plan.d


def fmod(x, m):
    inv = np.float32(1.0 / m)
    q1 = jnp.round(x.astype(jnp.float32) * inv).astype(jnp.int32)
    r1 = x - q1 * np.int32(m)
    q2 = jnp.round(r1.astype(jnp.float32) * inv).astype(jnp.int32)
    r2 = r1 - q2 * np.int32(m)
    r2 = jnp.where(r2 < 0, r2 + np.int32(m), r2)
    return jnp.where(r2 >= m, r2 - np.int32(m), r2)


def make_kernel(mode):
    primes = plan.primes
    P = len(primes)
    q = plan.q
    red = (lambda x, m: x) if mode == "dots" else \
          (fmod if mode == "barrett" else (lambda x, m: x % m))

    def _mm(x_hi, x_lo, m_hi, m_lo, p):
        dn = (((1,), (0,)), ((), ()))
        dot = partial(jax.lax.dot_general, dimension_numbers=dn,
                      preferred_element_type=jnp.int32)
        p11 = dot(x_hi, m_hi)
        p10 = dot(x_hi, m_lo) + dot(x_lo, m_hi)
        p00 = dot(x_lo, m_lo)
        if mode == "dots":
            return p11 + p10 + p00
        c16 = (1 << 16) % p
        c8 = (1 << 8) % p
        return red(red(p11, p) * c16, p) + red(red(p10, p) * c8, p) \
            + red(p00, p)

    def kernel(a_ref, b_ref, vhi_ref, vlo_ref, whi_ref, wlo_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]
        residues = []
        for pi in range(P):
            p = int(primes[pi])
            ap = red(a, p)
            bp = red(b, p)
            a_hi, a_lo = ntt_pallas._split_i8_arr(ap)
            b_hi, b_lo = ntt_pallas._split_i8_arr(bp)
            ahat = _mm(a_hi, a_lo, vhi_ref[pi], vlo_ref[pi], p)
            bhat = _mm(b_hi, b_lo, vhi_ref[pi], vlo_ref[pi], p)
            prod = red(red(ahat, p) * red(bhat, p), p) if mode != "dots" \
                else ahat * bhat
            pr_hi, pr_lo = ntt_pallas._split_i8_arr(
                prod if mode != "dots" else prod & 0x7FFF)
            residues.append(_mm(pr_hi, pr_lo, whi_ref[pi], wlo_ref[pi], p))
        if mode == "dots":
            out_ref[:] = sum(residues)
            return
        v = [residues[0]]
        for k in range(1, P):
            p = int(primes[k])
            t = red(residues[k] - v[0] + p, p)
            for j in range(1, k):
                t = red(t * int(plan.garner_inv[j - 1, k]), p)
                t = red(t - v[j] + p, p)
            t = red(t * int(plan.garner_inv[k - 1, k]), p)
            v.append(t)
        out = jnp.zeros_like(v[0])
        for j in range(P):
            out = out + red(v[j] * plan.prefix_mod_q[j], q)
        gt = jnp.zeros(v[0].shape, jnp.bool_)
        for j in range(P):
            mj = plan.m_half_digits[j]
            gt = (v[j] > mj) | ((v[j] == mj) & gt)
        out = out - jnp.where(gt, plan.m_mod_q, 0)
        out_ref[:] = red(out + q, q)

    return kernel


def build(mode):
    BLOCK = ntt_pallas.BLOCK
    P = len(plan.primes)
    spec = lambda: pl.BlockSpec((BLOCK, D), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    cspec = lambda: pl.BlockSpec((P, D, D), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((BATCH, D), jnp.int32),
        grid=(BATCH // BLOCK,),
        in_specs=[spec(), spec(), cspec(), cspec(), cspec(), cspec()],
        out_specs=spec())
    consts = [jnp.asarray(x) for x in ntt_pallas._plan_consts(plan)]

    def mul(a, b):
        return call(a, b, *consts)

    return mul


def bench(name, mul):
    def run(key):
        ka, kb = jax.random.split(key)
        a = sampling.uniform_zq(ka, (BATCH, D), p_.q)
        b = sampling.uniform_zq(kb, (BATCH, D), p_.q)

        def body(carry, _):
            aj = jnp.abs(a ^ carry) % jnp.int32(p_.q)
            out = mul(aj, b)
            return carry ^ out, None

        carry, _ = jax.lax.scan(body, jnp.zeros((BATCH, D), jnp.int32),
                                None, length=SCAN)
        return jnp.sum(carry, dtype=jnp.int32)

    f = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(f(jax.random.key(99)))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    rates = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(f(jax.random.key(i)))
        rates.append(BATCH * SCAN / (time.perf_counter() - t0))
    print(f"{name}: " + ", ".join(f"{r:,.0f}" for r in rates) + " ops/s",
          flush=True)


def main():
    which = sys.argv[1:] or ["dots", "rem", "barrett", "xla", "xlab"]
    # correctness first: barrett kernel must equal the rem kernel bitwise
    if "barrett" in which and "rem" in which:
        ka, kb = jax.random.split(jax.random.key(5))
        a = sampling.uniform_zq(ka, (BATCH, D), p_.q)
        b = sampling.uniform_zq(kb, (BATCH, D), p_.q)
        ra = np.asarray(build("rem")(a, b))
        rb = np.asarray(build("barrett")(a, b))
        assert np.array_equal(ra, rb), "barrett mismatch!"
        print("barrett == rem bitwise on 65536x64", flush=True)
    for mode in which:
        if mode == "xla":
            bench("xla", lambda a, b: ntt.negacyclic_polymul(a, b, plan))
        elif mode == "xlab":
            orig = modmath.mod_pos
            modmath.mod_pos = lambda x, m: fmod(x, int(m)) \
                if x.dtype == jnp.int32 else orig(x, m)
            try:
                bench("xla+barrett",
                      lambda a, b: ntt.negacyclic_polymul(a, b, plan))
            finally:
                modmath.mod_pos = orig
        else:
            bench(mode, build(mode))


if __name__ == "__main__":
    main()
