"""CRS virtual random oracle: determinism and layout disjointness."""

import numpy as np
import jax.numpy as jnp

from labrador_tpu.params import LabradorParams
from labrador_tpu.crs import CRS

P = LabradorParams(n=2, r=2)


def test_determinism():
    a1 = CRS.create(P, seed=123).a_rows(0, 4)
    a2 = CRS.create(P, seed=123).a_rows(0, 4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_seed_sensitivity():
    a1 = CRS.create(P, seed=123).a_rows(0, 4)
    a2 = CRS.create(P, seed=124).a_rows(0, 4)
    assert (np.asarray(a1) != np.asarray(a2)).any()


def test_row_blocks_consistent():
    """Fetching rows in blocks must agree with fetching the whole matrix —
    prover tiles and verifier re-expansion (verification.rs:274-296) must
    see identical values."""
    crs = CRS.create(P, seed=7)
    full = np.asarray(crs.a_rows())
    blk = np.asarray(crs.a_rows(row0=3, nrows=2))
    np.testing.assert_array_equal(blk, full[3:5])

    bfull = np.asarray(crs.b_rows(1, 2))
    bblk = np.asarray(crs.b_rows(1, 2, row0=5, nrows=3))
    np.testing.assert_array_equal(bblk, bfull[5:8])


def test_values_in_range():
    crs = CRS.create(P, seed=9)
    for arr in (crs.a_rows(0, 2), crs.b_rows(0, 0, 0, 2),
                crs.c_vec(0, 1, 0), crs.d_vec(1, 1, 0)):
        a = np.asarray(arr)
        assert a.min() >= 0 and a.max() < P.q


def test_matrix_offsets_disjoint():
    """Different (i,k)/(i,j,k) indices draw from different counter offsets
    (mirrors the structs.rs:55-144 layout being collision-free for the
    default t_2 <= t_1 configs)."""
    crs = CRS.create(P, seed=11)
    b00 = np.asarray(crs.b_rows(0, 0, 0, 1))
    b01 = np.asarray(crs.b_rows(0, 1, 0, 1))
    assert (b00 != b01).any()
    c010 = np.asarray(crs.c_vec(0, 1, 0))
    d010 = np.asarray(crs.d_vec(0, 1, 0))
    assert (c010 != d010).any()


def test_uniformity_rough():
    crs = CRS.create(P, seed=13)
    vals = np.asarray(crs.a_rows()).reshape(-1)
    # mean of U[0, q) is ~q/2; loose 3-sigma band
    assert abs(vals.mean() - P.q / 2) < 3 * P.q / np.sqrt(12 * vals.size)
