"""Property-based tests at the reference's level: the four proptest
properties (``/root/reference/tests/proptest.rs:13-81``), 50 generated
cases each with shrinking (hypothesis), vector length N = 16
(``proptest.rs:8``).  The fixed-seed loops in test_ntt.py / test_rq_ops.py
remain as fast deterministic smoke; these are the generative layer.

Shapes are FIXED (N=16, d=64) so each property compiles one XLA program;
hypothesis varies the data, not the shapes.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from labrador_tpu.params import LabradorParams
from labrador_tpu.ops import ntt, rq
from labrador_tpu.utils import golden

P = LabradorParams(n=2, r=2)
PLAN = ntt.plan_for(P)
N = 16  # proptest.rs:8
D = P.d

CASES = settings(max_examples=50, deadline=None, derandomize=True)


def _coeffs(shape):
    return hnp.arrays(np.int64, shape,
                      elements=st.integers(min_value=0, max_value=P.q - 1))


# -- property 1: NTT multiply == schoolbook multiply (proptest.rs:13-24) ----
@CASES
@given(a=_coeffs((D,)), b=_coeffs((D,)))
def test_ntt_preserves_result(a, b):
    got = np.asarray(ntt.negacyclic_polymul(
        jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), PLAN))
    want = golden.negacyclic_mul(a, b, P.q)
    np.testing.assert_array_equal(got, want)


# -- property 2: linearity of the poly-vec inner product, schoolbook oracle
#    c * <a, b> == <a, c * b>  (proptest.rs:36-48) ------------------------
@CASES
@given(a=_coeffs((N, D)), b=_coeffs((N, D)), c=_coeffs((D,)))
def test_linearity_schoolbook(a, b, c):
    lhs = golden.negacyclic_mul(c, golden.polyvec_inner(a, b, P.q), P.q)
    cb = np.stack([golden.negacyclic_mul(c, b[i], P.q) for i in range(N)])
    rhs = golden.polyvec_inner(a, cb, P.q)
    np.testing.assert_array_equal(lhs, rhs)


# -- property 3: same linearity through the NTT path (proptest.rs:51-64) ---
@CASES
@given(a=_coeffs((N, D)), b=_coeffs((N, D)), c=_coeffs((D,)))
def test_linearity_ntt(a, b, c):
    aj = jnp.asarray(a, jnp.int32)
    bj = jnp.asarray(b, jnp.int32)
    cj = jnp.asarray(c, jnp.int32)
    inner = ntt.polyvec_inner_product(aj, bj, PLAN)
    lhs = ntt.negacyclic_polymul(cj, inner, PLAN)
    cb = ntt.negacyclic_polymul(cj[None, :], bj, PLAN)
    rhs = ntt.polyvec_inner_product(aj, cb, PLAN)
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


# -- property 4: sigma_inv invariant — the constant term of
#    <sigma_inv(a_vec), b_vec> equals the plain Zq inner product of the
#    concatenated coefficient vectors (proptest.rs:67-81) ------------------
@CASES
@given(a=_coeffs((N, D)), b=_coeffs((N, D)))
def test_sigma_inv_invariant(a, b):
    aj = jnp.asarray(a, jnp.int32)
    bj = jnp.asarray(b, jnp.int32)
    conj = rq.sigma_inv(aj, P.q)
    inner = ntt.polyvec_inner_product(conj, bj, PLAN)
    const_term = int(np.asarray(inner)[0])
    want = int((a.reshape(-1) * b.reshape(-1) % P.q).sum() % P.q)
    assert const_term == want


# -- exact-digit decomposition roundtrip (the invariant recursion rests on;
#    no reference analog — their centered_rep digits are lossy) ------------
@CASES
@given(x=_coeffs((N,)), base=st.integers(min_value=2, max_value=300))
def test_exact_digits_reconstruct(x, base):
    from labrador_tpu.ops.decompose import decompose
    from labrador_tpu.params import _ceil_log
    t = _ceil_log(P.q, base)
    xc = jnp.where(jnp.asarray(x, jnp.int32) > P.q // 2,
                   jnp.asarray(x, jnp.int32) - P.q, jnp.asarray(x, jnp.int32))
    digs = np.asarray(decompose(xc, base, t, "exact"), np.int64)
    assert np.abs(digs).max() <= base // 2
    rec = sum(digs[k] * base**k for k in range(t))
    np.testing.assert_array_equal(rec % P.q, x % P.q)
