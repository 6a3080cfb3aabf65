"""Parameter derivation must match RuntimeConstants::new (constants.rs:234-264)
f64-for-f64.  Expected values below were hand-derived from the Rust formulas."""

from labrador_tpu.params import (
    LabradorParams, find_suitable_prime, ntt_prime_table, is_ntt_friendly,
)


def test_find_suitable_prime_default():
    # constants.rs:195 — Q = find_suitable_prime((1<<13)-1) = 8191 (prime)
    assert find_suitable_prime((1 << 13) - 1) == 8191


def test_find_suitable_prime_large():
    # constants.rs:196 (commented alternative): next prime >= 2^32-1
    assert find_suitable_prime((1 << 32) - 1) == 4294967311


def test_params_small_config():
    p = LabradorParams(n=2, r=2)
    assert p.q == 8191
    # beta = floor(sqrt(30/128)*8191/125) = 31   (constants.rs:241)
    assert p.beta_bound == 31
    # std = 31/sqrt(256) = 1.9375                 (constants.rs:242)
    assert abs(p.std - 1.9375) < 1e-12
    # b = round(sqrt(sqrt(12*2*71)*1.9375)) = 9   (constants.rs:243)
    assert p.b == 9
    # t1 = round(log2(8191)/log2(9)) = 4          (constants.rs:244)
    assert p.t_1 == 4
    # b1 = trunc(8191^(1/4)) = 9                  (constants.rs:245)
    assert p.b_1 == 9
    # t2 = round(log2(sqrt(24*128)*1.9375^2)/log2(9)) = 2
    assert p.t_2 == 2
    # b2 = round((sqrt(24*128)*1.9375^2)^(1/2)) = 14
    assert p.b_2 == 14
    assert p.kappa == p.kappa_1 == p.kappa_2 == 128
    # gamma (squared) = 31^2 * 71
    assert p.gamma == 31 * 31 * 71.0
    assert p.upper_bound == 1
    # inv2 * 2 == 1 mod q
    assert (p.inv2 * 2) % p.q == 1


def test_ntt_prime_table():
    primes = ntt_prime_table(64)
    assert all(is_ntt_friendly(p) for p in primes)
    assert all(p <= 32513 for p in primes)
    assert len(primes) >= 5
    assert primes[0] > primes[1]  # descending


def test_crt_primes_cover_range():
    p = LabradorParams(n=2, r=2)
    prod = 1
    for pr in p.crt_primes:
        prod *= pr
    assert prod > 2 * max(2 * p.kappa, 1024) * p.d * (p.q - 1) ** 2


def test_unsupported_q_gap_raises():
    """Moduli in (P_MAX, 2^32] are rejected with a clear error at plan
    creation instead of an opaque trace-time Barrett assert (ADVICE r1)."""
    import pytest
    from labrador_tpu.ops.ntt import make_plan
    with pytest.raises(NotImplementedError, match="unsupported"):
        make_plan(65537)
    with pytest.raises(NotImplementedError, match="unsupported"):
        make_plan((1 << 31) - 1)


def test_c14_budget_covers_dense_gh_population():
    """Round-5 regression: Check 14 sums the FULL (r, r, d) g/h digit
    tensors — reference-faithful (verification.rs:240-255 loops i,j in
    0..R, off-diagonals twice) — so the exact-mode beta'^2 budget must
    count r^2*d g/h values.  Rounds 1-4 budgeted only the triangle; honest
    uniform-residue commitments then exceeded the budget once the g/h
    share grew (every big-q 2^14+ realistic-witness sweep row failed c14).
    This synthesizes worst-case-honest values (uniform mod q in every
    t/g/h slot, symmetric) at a shape where the triangle budget is
    exceeded by the dense population (dense expectation = 1.26x the old
    budget) and asserts check14 passes under the dense budget."""
    import numpy as np
    import jax.numpy as jnp
    from labrador_tpu import protocol
    from labrador_tpu.verifier import check14_norm_bound

    p = LabradorParams(n=2, r=16, kappa_override=16, exact_digits=True)
    rng = np.random.default_rng(14)
    t = jnp.asarray(rng.integers(0, p.q, (p.r, p.kappa, p.d)), jnp.int32)
    g = rng.integers(0, p.q, (p.r, p.r, p.d))
    g = jnp.asarray(np.triu(g) + np.triu(g, 1).transpose(1, 0, 2), jnp.int32)
    h = rng.integers(0, p.q, (p.r, p.r, p.d))
    h = jnp.asarray(np.triu(h) + np.triu(h, 1).transpose(1, 0, 2), jnp.int32)
    z = jnp.zeros((p.n, p.d), jnp.int32)
    ok = check14_norm_bound(
        p, z,
        protocol.decompose_z(z, p, "exact"),
        protocol.decompose_t(t, p, "exact"),
        protocol.decompose_g(g, p, "exact"),
        protocol.decompose_h(h, p, "exact"))
    assert bool(np.asarray(ok)), \
        "uniform-residue (honest worst-case) digit population exceeds beta'^2"
