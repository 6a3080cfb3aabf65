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
