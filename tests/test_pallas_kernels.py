"""Pallas fused kernels must agree bit-for-bit with the XLA reference path
(run in TPU-interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from labrador_tpu.params import LabradorParams
from labrador_tpu.ops import ntt, ntt_pallas

P = LabradorParams(n=2, r=2)
PLAN = ntt.plan_for(P)


def test_fused_polymul_matches_xla():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, P.q, (500, 64)), jnp.int32)
    b = jnp.asarray(rng.integers(0, P.q, (500, 64)), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = ntt_pallas.negacyclic_polymul_pallas(a, b, PLAN)
    want = ntt.negacyclic_polymul(a, b, PLAN)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_polymul_block_padding():
    """Sizes above BLOCK exercise the grid + padding path."""
    rng = np.random.default_rng(8)
    n = ntt_pallas.BLOCK + 77
    a = jnp.asarray(rng.integers(0, P.q, (n, 64)), jnp.int32)
    b = jnp.asarray(rng.integers(0, P.q, (n, 64)), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = ntt_pallas.negacyclic_polymul_pallas(a, b, PLAN)
    want = ntt.negacyclic_polymul(a, b, PLAN)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
