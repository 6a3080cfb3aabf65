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
