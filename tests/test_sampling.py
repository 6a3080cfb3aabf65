import numpy as np
import jax
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams, TAU, T_OPNORM
from labrador_tpu import sampling

P = LabradorParams(n=2, r=2)


def test_witness_norm_bound():
    w = sampling.generate_witness(jax.random.key(0), P)
    assert w.shape == (P.r, P.n, P.d)
    a = np.asarray(w, np.int64)
    assert (a >= 0).all() and (a < P.q).all()
    assert (a * a).sum() <= P.beta_bound**2


def test_challenge_multiset_and_norm():
    c = sampling.sample_challenge(jax.random.key(1), P)
    a = np.asarray(c, np.int64)
    centered = np.where(a > P.q // 2, a - P.q, a)
    vals, counts = np.unique(np.abs(centered), return_counts=True)
    hist = dict(zip(vals.tolist(), counts.tolist()))
    # fixed multiset: 23 zeros, 31 ones, 10 twos (verification.rs:462-472)
    assert hist == {0: 23, 1: 31, 2: 10}
    assert (centered * centered).sum() == int(TAU)
    opn = float(sampling.operator_norm_exact(jnp.asarray(centered, jnp.int32),
                                             P.d))
    assert opn <= T_OPNORM + 1e-4


def test_operator_norm_exact_dominates_sampled():
    """The exact spectral norm upper-bounds the reference's statistical
    estimate (util.rs:227-246)."""
    key = jax.random.key(2)
    c = sampling.uniform_zq(key, (P.d,), P.q)
    centered = jnp.where(c > P.q // 2, c - P.q, c)
    exact = float(sampling.operator_norm_exact(centered, P.d))
    est = float(sampling.operator_norm_sampled(jax.random.key(3), c, P,
                                               n_samples=200))
    assert est <= exact * 1.001


def test_jl_matrix_distribution():
    m = sampling.sample_jl_matrix(jax.random.key(4), P)
    a = np.asarray(m, np.int64)
    assert a.shape == (256, P.n * P.d)
    assert set(np.unique(a)) <= {-1, 0, 1}
    frac0 = (a == 0).mean()
    assert 0.45 < frac0 < 0.55  # P(0) = 1/2


def test_uniform_zq_range_and_mean():
    v = sampling.uniform_zq(jax.random.key(5), (20000,), P.q)
    a = np.asarray(v, np.int64)
    assert a.min() >= 0 and a.max() < P.q
    assert abs(a.mean() - P.q / 2) < 3 * P.q / np.sqrt(12 * a.size)


def test_witness_norm_exact_bigq():
    """Big-q witness generation: the accepted witness satisfies the norm
    bound under *object-integer* (infinite-precision) accounting — guards
    the pre-halving phase that keeps sum_sq_u64 within its < 2^64
    exactness contract (ADVICE r1: the raw u64 sum of pre-rejection values
    could wrap and spuriously accept an over-norm witness)."""
    p = LabradorParams(n=4, r=4, q_start=(1 << 32) - 1)
    w = sampling.generate_witness(jax.random.key(3), p)
    a = np.asarray(w).astype(object)
    assert (a >= 0).all()
    total = int((a * a).sum())
    assert total <= p.beta_bound**2
