import numpy as np
import jax.numpy as jnp

from labrador_tpu.ops import modmath as mm


def test_split_i8_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, mm.P_MAX, size=(1024,), dtype=np.int32))
    hi, lo = mm.split_i8(x)
    assert hi.dtype == jnp.int8 and lo.dtype == jnp.int8
    back = hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_modmul_mm_exact():
    rng = np.random.default_rng(1)
    p = 32257  # near-P_MAX 64-NTT prime
    a = rng.integers(0, p, size=(17, 200), dtype=np.int64)
    b = rng.integers(0, p, size=(200, 23), dtype=np.int64)
    want = (a @ b) % p
    got = mm.modmul_mm(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), p)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)


def test_modmul_mm_batched():
    rng = np.random.default_rng(2)
    p = 12289
    a = rng.integers(0, p, size=(3, 8, 64), dtype=np.int64)
    b = rng.integers(0, p, size=(3, 64, 5), dtype=np.int64)
    want = np.einsum("bij,bjk->bik", a, b) % p
    got = mm.modmul_mm(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32),
                       p, batch_dims=1)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)


def test_modmul_mm_chunked():
    rng = np.random.default_rng(3)
    p = 31873
    n = mm.CHUNK + 1000  # force the chunked path
    a = rng.integers(0, p, size=(2, n), dtype=np.int64)
    b = rng.integers(0, p, size=(n, 3), dtype=np.int64)
    want = (a @ b) % p
    got = mm.modmul_mm(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), p)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)


def test_u64_sum_exact():
    rng = np.random.default_rng(4)
    # values whose square sum overflows both int32 and f32 precision
    x = rng.integers(0, 2**15, size=(100000,), dtype=np.int64)
    want = int((x * x).sum())
    got = mm.u64_to_py(mm.u64_sum(jnp.asarray(x * x, jnp.int32)))
    assert got == want


def test_u64_leq_const():
    x = mm.u64_sum(jnp.asarray([2**15 - 1] * 10, jnp.int32) ** 1)
    # sum = 10*(2^15-1) = 327670
    assert bool(mm.u64_leq_const(x, 327670))
    assert not bool(mm.u64_leq_const(x, 327669))


def test_mul32x32_u64():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 2**31, size=(1000,), dtype=np.int64)
    b = rng.integers(0, 2**31, size=(1000,), dtype=np.int64)
    hi, lo = mm.mul32x32_u64(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(lo).astype(np.uint32).astype(np.uint64)
    np.testing.assert_array_equal(got, (a * b).astype(np.uint64))


def test_mod_pos_float_barrett_exact():
    """The float32-Barrett fast path (m <= P_MAX, int32 x) must equal true
    mod over the full documented |x| <= 2^31 - 2^20 contract, including the
    largest value the codebase produces (_mod_sum chunked partials,
    2^16 * (P_MAX - 1)) and negatives.  Round 4: integer % has no hardware
    divide on the TPU VPU and cost 2.2x in the polymul kernel."""
    rng = np.random.default_rng(6)
    lim = 2**31 - 2**20
    edge = np.array([0, 1, -1, lim, -lim, 2**30, -(2**30),
                     2**16 * (mm.P_MAX - 1), -(2**16) * (mm.P_MAX - 1)],
                    np.int64)
    for m in (2, 3, 17, 257, 8191, 12289, 32503, mm.P_MAX):
        xs = np.concatenate([
            rng.integers(-lim, lim, 100000),
            edge, np.array([m, -m, m - 1, 1 - m], np.int64),
        ]).astype(np.int32)
        got = np.asarray(mm.mod_pos(jnp.asarray(xs), m))
        want = np.mod(xs.astype(np.int64), m).astype(np.int32)
        np.testing.assert_array_equal(got, want, err_msg=f"m={m}")


def test_mod_pos_small_one_step_exact():
    """One-step float Barrett (mod_pos_small): exact over its documented
    contract |x| < 2^24, m >= 64 — used on the d=64 transform dot outputs
    inside modmul_mm_p and the fused NTT kernel."""
    rng = np.random.default_rng(7)
    lim = (1 << 24) - 1
    for m in (64, 257, 8191, 12289, 32503, mm.P_MAX):
        xs = np.concatenate([
            rng.integers(-lim, lim, 100000),
            np.array([0, 1, -1, lim, -lim, m, -m, m - 1, 1 - m], np.int64),
        ]).astype(np.int32)
        got = np.asarray(mm.mod_pos_small(jnp.asarray(xs), np.array([m])))
        want = np.mod(xs.astype(np.int64), m).astype(np.int32)
        np.testing.assert_array_equal(got, want, err_msg=f"m={m}")
