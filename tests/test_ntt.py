"""NTT correctness vs golden schoolbook — the TPU analog of the reference's
``test_NTT_preserves_result`` property (tests/proptest.rs:13-24)."""

import numpy as np
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu.ops import ntt
from labrador_tpu.utils import golden

P = LabradorParams(n=2, r=2)
PLAN = ntt.plan_for(P)


def rand_poly(rng, q, shape=()):
    return rng.integers(0, q, size=shape + (64,), dtype=np.int64)


def test_polymul_matches_schoolbook():
    rng = np.random.default_rng(10)
    for _ in range(20):
        a = rand_poly(rng, P.q)
        b = rand_poly(rng, P.q)
        want = golden.negacyclic_mul(a, b, P.q).astype(np.int64)
        got = ntt.negacyclic_polymul(
            jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), PLAN)
        np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_polymul_batched():
    rng = np.random.default_rng(11)
    a = rand_poly(rng, P.q, (5,))
    b = rand_poly(rng, P.q, (5,))
    got = ntt.negacyclic_polymul(
        jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), PLAN)
    for i in range(5):
        want = golden.negacyclic_mul(a[i], b[i], P.q).astype(np.int64)
        np.testing.assert_array_equal(np.asarray(got[i], np.int64), want)


def test_ntt_roundtrip():
    rng = np.random.default_rng(12)
    a = rand_poly(rng, P.q, (7,))
    ahat = ntt.ntt_fwd(jnp.asarray(a, jnp.int32), PLAN)
    back = ntt.ntt_inv_modq(ahat, PLAN)
    np.testing.assert_array_equal(np.asarray(back, np.int64), a % P.q)


def test_polyvec_inner_product():
    rng = np.random.default_rng(13)
    m = 16  # matches the reference proptest N=16 (tests/proptest.rs:8)
    a = rand_poly(rng, P.q, (m,))
    b = rand_poly(rng, P.q, (m,))
    want = golden.polyvec_inner(a, b, P.q).astype(np.int64)
    got = ntt.polyvec_inner_product(
        jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), PLAN)
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_inner_product_linearity():
    """c * <a, b> == <a, c*b> — reference proptest properties 2 and 3
    (tests/proptest.rs:36-64); one property here since we have one mul path
    and the golden test above covers NTT-vs-schoolbook."""
    from labrador_tpu.ops import rq as rq_ops
    rng = np.random.default_rng(14)
    m = 16
    a = jnp.asarray(rand_poly(rng, P.q, (m,)), jnp.int32)
    b = jnp.asarray(rand_poly(rng, P.q, (m,)), jnp.int32)
    c = int(rng.integers(0, P.q))
    ab = ntt.polyvec_inner_product(a, b, PLAN)
    ab_scaled = ntt.polyvec_inner_product(a, rq_ops.scale(b, c, P.q), PLAN)
    np.testing.assert_array_equal(
        np.asarray(rq_ops.scale(ab, c, P.q)), np.asarray(ab_scaled))


def test_large_accumulation_exact():
    """Sum of many products — beyond f64 mantissa territory, and checks the
    CRT range sizing for kappa-length contractions."""
    rng = np.random.default_rng(15)
    m = 256
    a = rand_poly(rng, P.q, (m,))
    b = rand_poly(rng, P.q, (m,))
    want = golden.polyvec_inner(a, b, P.q).astype(np.int64)
    got = ntt.polyvec_inner_product(
        jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), PLAN)
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)
