import numpy as np
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu.ops import rq, ntt, decompose
from labrador_tpu.utils import golden

P = LabradorParams(n=2, r=2)
PLAN = ntt.plan_for(P)


def test_sigma_inv_matches_golden():
    rng = np.random.default_rng(20)
    a = rng.integers(0, P.q, size=(64,), dtype=np.int64)
    want = golden.sigma_inv(a, P.q).astype(np.int64)
    got = rq.sigma_inv(jnp.asarray(a, jnp.int32), P.q)
    np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_sigma_inv_invariant():
    """Constant term of <sigma_inv(a_vec), b_vec> equals the plain Zq inner
    product of concatenated coefficients — reference proptest property 4
    (tests/proptest.rs:67-81), the golden test for JL/aggregation algebra."""
    rng = np.random.default_rng(21)
    m = 16
    a_flat = rng.integers(0, P.q, size=(m * 64,), dtype=np.int64)
    b_flat = rng.integers(0, P.q, size=(m * 64,), dtype=np.int64)
    want = int((a_flat * b_flat).sum() % P.q)

    a_vec = rq.coeff_split(jnp.asarray(a_flat, jnp.int32), 64)
    b_vec = rq.coeff_split(jnp.asarray(b_flat, jnp.int32), 64)
    inv_a = rq.sigma_inv(a_vec, P.q)
    prod = ntt.polyvec_inner_product(inv_a, b_vec, PLAN)
    got = int(rq.eval_at_zero(prod))
    assert got == want


def test_decompose_matches_reference_rule():
    rng = np.random.default_rng(22)
    vals = rng.integers(0, P.q, size=(500,), dtype=np.int64)
    for base, nd in [(P.b, 2), (P.b_1, P.t_1), (P.b_2, P.t_2)]:
        got = decompose.decompose(jnp.asarray(vals, jnp.int32), base, nd)
        got = np.asarray(got, np.int64)
        for i, v in enumerate(vals):
            want = golden.decompose_coeff_reference(int(v), base, nd)
            np.testing.assert_array_equal(got[:, i], want)


def test_decompose_exact_mode_reconstructs():
    rng = np.random.default_rng(23)
    vals = jnp.asarray(rng.integers(0, P.q, size=(100,), dtype=np.int64),
                       jnp.int32)
    nd = P.t_1 + 1  # enough digits for exact q-range reconstruction
    digs = decompose.decompose(vals, P.b_1, nd, mode="exact")
    back = decompose.reconstruct(digs, P.b_1, P.q)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


def test_norm_exact_vs_python():
    rng = np.random.default_rng(24)
    a = rng.integers(0, P.q, size=(32, 64), dtype=np.int64)
    want = int((a * a).sum())
    assert rq.norm_sq_exact(jnp.asarray(a, jnp.int32)) == want


def test_coeff_concat_roundtrip():
    rng = np.random.default_rng(25)
    a = jnp.asarray(rng.integers(0, P.q, size=(4, 64)), jnp.int32)
    flat = rq.coeff_concat(a)
    assert flat.shape == (256,)
    back = rq.coeff_split(flat, 64)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))
