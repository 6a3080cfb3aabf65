"""Common Reference String: a virtual, lazily-expanded random oracle.

Reference behavior (``/root/reference/src/structs.rs:27-190``): the CRS is a
32-byte base seed; matrix entries are defined positionally by a global
integer *offset* from that seed (A rows, then B matrices, then C, then D),
and every coefficient is drawn by re-keying a ChaCha20Rng at
``base_seed + offset`` (``structs.rs:167-171``).

TPU-native re-design: the same offset *layout* (formulas below are verbatim
from ``fetch_A_row``/``fetch_B_ik_row``/``fetch_C_ijk``/``fetch_D_ijk``,
``structs.rs:55-144``, including their quirks¹) keyed into a counter-mode
Threefry PRG (ops/prg.py), so any tile of any matrix materializes on device
in parallel and the full matrices never need to exist in HBM at once.

¹ Quirks kept for layout fidelity (they only affect *which* random values
  land where, and prover/verifier share the layout, so the protocol is
  self-consistent): the B-matrix stride ``(i*T1+k) * (kappa_1*kappa)``
  omits a factor D (``structs.rs:82``), and the C/D column offsets use T_1
  where C logically has T_2 digits (``structs.rs:106``).

Matrix shapes (coefficient domain, int32 in [0, q)):
  A      : (kappa, n, d)      — inner Ajtai commitment matrix
  B_ik   : (kappa_1, kappa, d) for i < r, k < t_1
  C_ijk  : (kappa_2, d)        for i <= j < r, k < t_2
  D_ijk  : (kappa_2, d)        for i <= j < r, k < t_1
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .params import LabradorParams
from .ops import prg
from .ops import zq as zq_ops


def _np_offsets(start: int, count: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side offset range [start, start+count) as (hi, lo) uint32."""
    offs = np.arange(start, start + count, dtype=np.uint64)
    return (offs >> np.uint64(32)).astype(np.uint32), \
        (offs & np.uint64(0xFFFFFFFF)).astype(np.uint32)


class _CrsLayout:
    """Shared offset layout + fetchers: subclasses provide ``_expand`` /
    ``_expand_dyn`` (Threefry counter-mode on device, or gathers from a
    host-materialized ChaCha-compatible coefficient stream)."""

    # -- offset layout (verbatim from structs.rs:55-144) -------------------
    @property
    def _off_a(self) -> int:
        return 0

    @property
    def _off_b(self) -> int:
        p = self.params
        return p.kappa * p.n * p.d          # structs.rs:78

    def _b_start(self, i: int, k: int, row: int = 0) -> int:
        p = self.params
        size_b = p.kappa_1 * p.kappa        # structs.rs:81 (quirk: no *D)
        return self._off_b + (i * p.t_1 + k) * size_b + row * p.kappa * p.d

    @property
    def _off_c(self) -> int:
        p = self.params
        size_b = p.kappa_1 * p.kappa
        num_b = p.r * p.t_1
        return self._off_b + num_b * size_b * p.d   # structs.rs:108

    @staticmethod
    def _sum_pairs(i: int, r: int) -> int:
        return i * r - i * (i - 1) // 2 if i > 0 else 0   # structs.rs:101-105

    def _c_start(self, i: int, j: int, k: int) -> int:
        p = self.params
        off = k + p.t_1 * (self._sum_pairs(i, p.r) + (j - i))  # structs.rs:106
        return self._off_c + off * (p.kappa_2 * p.d)

    @property
    def _off_d(self) -> int:
        p = self.params
        num_c = p.r * (p.r + 1) // 2
        return self._off_c + num_c * (p.kappa_2 * p.d)  # structs.rs:138

    def _d_start(self, i: int, j: int, k: int) -> int:
        p = self.params
        off = k + p.t_1 * (self._sum_pairs(i, p.r) + (j - i))
        return self._off_d + off * (p.kappa_2 * p.d)

    def a_rows(self, row0: int = 0, nrows: int | None = None) -> jax.Array:
        """(nrows, n, d) block of A starting at row0 (``fetch_A_row``,
        structs.rs:55-72; offset = row * n * d)."""
        p = self.params
        nrows = p.kappa if nrows is None else nrows
        return self._expand(row0 * p.n * p.d, (nrows, p.n, p.d))

    def b_rows(self, i: int, k: int, row0: int = 0,
               nrows: int | None = None) -> jax.Array:
        """(nrows, kappa, d) block of B_ik (``fetch_B_ik_row``,
        structs.rs:74-88)."""
        p = self.params
        nrows = p.kappa_1 if nrows is None else nrows
        # NOTE: consecutive rows stride kappa*d (structs.rs:82), and a row is
        # kappa polys of d coeffs — contiguous, so a block is contiguous.
        return self._expand(self._b_start(i, k, row0), (nrows, p.kappa, p.d))

    def c_vec(self, i: int, j: int, k: int) -> jax.Array:
        """(kappa_2, d) column vector C_ijk (``fetch_C_ijk``, structs.rs:90-114)."""
        p = self.params
        return self._expand(self._c_start(i, j, k), (p.kappa_2, p.d))

    def d_vec(self, i: int, j: int, k: int) -> jax.Array:
        """(kappa_2, d) column vector D_ijk (``fetch_D_ijk``, structs.rs:116-144)."""
        p = self.params
        return self._expand(self._d_start(i, j, k), (p.kappa_2, p.d))

    def a_rows_dyn(self, row0, nrows: int) -> jax.Array:
        """(nrows, n, d) block of A at a *traced* row offset — for
        row-sharded Ajtai commitments (shard_map over the kappa axis)."""
        p = self.params
        return self._expand_dyn(0, row0, p.n * p.d,
                                (nrows, p.n, p.d), (p.n * p.d, p.d, 1))

    def b_cols_dyn(self, i: int, k: int, col0, ncols: int) -> jax.Array:
        """(kappa_1, ncols, d) column block of B_ik at a traced column
        offset — for contraction-sharded u1 (each device holds a kappa
        slice of t and the matching B columns; partial u1 rows are psum'd).
        """
        p = self.params
        return self._expand_dyn(self._b_start(i, k), col0, p.d,
                                (p.kappa_1, ncols, p.d),
                                (p.kappa * p.d, p.d, 1))

    def b_mat_dyn(self, m, col0=0, ncols: int | None = None) -> jax.Array:
        """(kappa_1, ncols, d) column block of the m-th B matrix, where
        m = i * t_1 + k is a *traced* linear matrix index (the offset layout
        is linear in m, structs.rs:82) — enables lax.scan over all B
        matrices with one traced body."""
        p = self.params
        ncols = p.kappa if ncols is None else ncols
        size_b = p.kappa_1 * p.kappa
        return self._expand_dyn(self._off_b, m, size_b,
                                (p.kappa_1, ncols, p.d),
                                (p.kappa * p.d, p.d, 1),
                                idx1=col0, stride1=p.d)

    def c_vec_dyn(self, oc) -> jax.Array:
        """(kappa_2, d) C column at traced linear offset index
        oc = k + t_1 * tri(i, j)  (structs.rs:106 layout, incl. the t_1
        quirk)."""
        p = self.params
        return self._expand_dyn(self._off_c, oc, p.kappa_2 * p.d,
                                (p.kappa_2, p.d), (p.d, 1))

    def d_vec_dyn(self, oc) -> jax.Array:
        p = self.params
        return self._expand_dyn(self._off_d, oc, p.kappa_2 * p.d,
                                (p.kappa_2, p.d), (p.d, 1))

    # -- batch materializers (small configs / tests) -----------------------
    def b_all(self) -> jax.Array:
        """(r, t_1, kappa_1, kappa, d) — all B matrices.  Only for small
        configs; large runs stream b_rows tiles inside the u1 matmul."""
        p = self.params
        mats = [[self.b_rows(i, k) for k in range(p.t_1)] for i in range(p.r)]
        return zq_ops.stack([zq_ops.stack(row) for row in mats])

    def c_all(self) -> jax.Array:
        """(r, r, t_2, kappa_2, d) with only i <= j populated (zeros below)."""
        p = self.params
        out = zq_ops.zeros((p.r, p.r, p.t_2, p.kappa_2, p.d), p.q)
        for i in range(p.r):
            for j in range(i, p.r):
                for k in range(p.t_2):
                    out = zq_ops.tmap(lambda o, v: o.at[i, j, k].set(v),
                                      out, self.c_vec(i, j, k))
        return out

    def d_all(self) -> jax.Array:
        """(r, r, t_1, kappa_2, d) with only i <= j populated."""
        p = self.params
        out = zq_ops.zeros((p.r, p.r, p.t_1, p.kappa_2, p.d), p.q)
        for i in range(p.r):
            for j in range(i, p.r):
                for k in range(p.t_1):
                    out = zq_ops.tmap(lambda o, v: o.at[i, j, k].set(v),
                                      out, self.d_vec(i, j, k))
        return out


@struct.dataclass
class CRS(_CrsLayout):
    """Seeded virtual CRS.  ``key`` is a pair of uint32 (the counter-mode
    analog of the 32-byte base seed at ``structs.rs:176``).  A pytree: the
    key is a *traced* leaf so jitted prover/verifier programs are reused
    across CRS seeds (a static key would make XLA constant-fold the entire
    CRS expansion at compile time).  ``params`` is static metadata."""

    key: jax.Array  # (2,) uint32
    params: LabradorParams = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: LabradorParams, seed: int) -> "CRS":
        key = jnp.asarray([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                          jnp.uint32)
        return cls(key=key, params=params)

    # -- expansion ---------------------------------------------------------
    def _expand(self, start: int, shape: tuple[int, ...]):
        count = int(np.prod(shape))
        hi, lo = _np_offsets(start, count)
        vals = prg.uniform_mod_q(self.key[0], self.key[1],
                                 jnp.asarray(hi), jnp.asarray(lo),
                                 self.params.q)
        return zq_ops.reshape(vals, shape)

    # -- dynamic-index expansion (sharded/tiled consumers) -----------------
    def _expand_dyn(self, base: int, idx0, stride0: int,
                    shape: tuple[int, ...], strides: tuple[int, ...],
                    idx1=None, stride1: int = 0) -> jax.Array:
        """Expand a tile whose origin depends on *traced* indices.

        offset[i0, i1, ...] = base + idx0*stride0 [+ idx1*stride1]
                              + sum_k i_k * strides[k].
        idx0/idx1 are traced nonneg int32 scalars (scan counters, shard
        indices from jax.lax.axis_index); everything else is static.
        64-bit offset arithmetic is emulated on uint32 pairs (ops/prg.py).
        """
        start = prg.offset_add(prg.offset_const(base),
                               prg.offset_mul_i32(jnp.int32(idx0), stride0))
        if idx1 is not None:
            start = prg.offset_add(
                start, prg.offset_mul_i32(jnp.int32(idx1), stride1))
        off = (jnp.asarray(start[0], jnp.uint32),
               jnp.asarray(start[1], jnp.uint32))
        for ax, (n_ax, s_ax) in enumerate(zip(shape, strides)):
            offs = np.arange(n_ax, dtype=np.uint64) * np.uint64(s_ax)
            bshape = (1,) * ax + (n_ax,) + (1,) * (len(shape) - ax - 1)
            off = prg.offset_add(off, (
                jnp.asarray((offs >> np.uint64(32)).astype(np.uint32)).reshape(bshape),
                jnp.asarray((offs & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(bshape)))
        vals = prg.uniform_mod_q(self.key[0], self.key[1], off[0], off[1],
                                 self.params.q)
        return zq_ops.tmap(lambda v: jnp.broadcast_to(v, shape), vals)


def _used_intervals(p: LabradorParams) -> list[tuple[int, int]]:
    """Coefficient-offset intervals the protocol actually reads, per the
    structs.rs:55-144 layout *including its quirks*: the B stride omits a
    factor d (structs.rs:82), so consecutive B matrices overlap and a huge
    never-read gap separates the last-read B coefficient from _off_c; the
    C/D column offsets use t_1 where C logically has t_2 digits
    (structs.rs:106), so C reads can run past _off_d into D's region."""
    size_b = p.kappa_1 * p.kappa
    off_b = p.kappa * p.n * p.d
    off_c = off_b + (p.r * p.t_1) * size_b * p.d
    n_tri = p.r * (p.r + 1) // 2
    off_d = off_c + n_tri * (p.kappa_2 * p.d)
    b_end = off_b + (p.r * p.t_1 - 1) * size_b + p.kappa_1 * p.kappa * p.d
    c_end = off_c + ((p.t_2 - 1) + p.t_1 * (n_tri - 1) + 1) * p.kappa_2 * p.d
    d_end = off_d + ((p.t_1 - 1) + p.t_1 * (n_tri - 1) + 1) * p.kappa_2 * p.d
    return [(0, b_end), (off_c, max(c_end, d_end))]


@struct.dataclass
class MaterializedCRS(_CrsLayout):
    """Reference-parity CRS backend: the coefficient stream is generated on
    the host by the ChaCha20-compatible generator (native/chacha_compat.cpp,
    reproducing ``CRS::generate_random_coeff``'s per-coefficient re-key at
    structs.rs:147-171 bit-for-bit) and held as one flat device array;
    fetches become slices/gathers.  Same fetch API as ``CRS``, so the whole
    prover/verifier pipeline runs unchanged on reference-identical CRS
    values (SURVEY.md §4(b): bit-exact vectors vs the reference).

    Only for small configs — the runtime path is the virtual counter-mode
    ``CRS``; this backend exists for cross-validation."""

    coeffs: jax.Array  # (total,) int32 residues in [0, q)
    key: jax.Array     # (2,) uint32 FS-oracle salt derived from the seed
    params: LabradorParams = struct.field(pytree_node=False)

    @classmethod
    def create_chacha(cls, params: LabradorParams,
                      base_seed: bytes) -> "MaterializedCRS":
        """Generate every protocol-read coefficient from ``base_seed``
        exactly as the reference's lazy oracle would (structs.rs:55-171)."""
        from . import native
        assert len(base_seed) == 32
        assert not zq_ops.is_big(params.q), \
            "reference parity only exists at reference-runnable moduli"
        intervals = _used_intervals(params)
        total = intervals[-1][1]
        flat = np.zeros(total, np.int64)
        for lo, hi in intervals:
            flat[lo:hi] = native.crs_coeffs(base_seed, lo, hi - lo, params.q)
        key = np.frombuffer(base_seed[:8], dtype=">u4").astype(np.uint32)
        return cls(coeffs=jnp.asarray(flat, jnp.int32),
                   key=jnp.asarray(key), params=params)

    def _expand(self, start: int, shape: tuple[int, ...]):
        count = int(np.prod(shape))
        return jax.lax.dynamic_slice_in_dim(
            self.coeffs, start, count).reshape(shape)

    def _expand_dyn(self, base: int, idx0, stride0: int,
                    shape: tuple[int, ...], strides: tuple[int, ...],
                    idx1=None, stride1: int = 0) -> jax.Array:
        idx = jnp.int32(base) + jnp.int32(idx0) * jnp.int32(stride0)
        if idx1 is not None:
            idx = idx + jnp.int32(idx1) * jnp.int32(stride1)
        for ax, (n_ax, s_ax) in enumerate(zip(shape, strides)):
            grid = (np.arange(n_ax, dtype=np.int64) * s_ax).astype(np.int32)
            bshape = (1,) * ax + (n_ax,) + (1,) * (len(shape) - ax - 1)
            idx = idx + jnp.asarray(grid).reshape(bshape)
        return jnp.take(self.coeffs, idx, mode="fill", fill_value=0)
