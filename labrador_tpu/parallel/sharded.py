"""Multi-chip prover/verifier: shard_map over a (dp, rows) mesh.

Parallel decomposition (SURVEY.md §5.8 — the mapping from the reference's
rayon loops to mesh axes is 1:1 because every reduction is a sum over
independent (row, witness-index, digit) contributions):

  * ``dp``   axis shards a *batch* of independent proof instances.
  * ``rows`` axis shards the kappa dimension: each device PRG-expands only
    its own CRS row/column tiles (the CRS never materializes anywhere),
    computes its slice of the Ajtai commitment t = A s and its partials of
    the outer commitments u1/u2; one ``psum``/``all_gather`` over ``rows``
    (riding ICI) completes each reduction.

There is ONE protocol implementation: these factories wrap the ordinary
``prover.prove_impl`` / ``verifier.verify_report_impl`` in shard_map with a
``protocol.AxisCtx`` — the sharded path cannot drift from the single-chip
path because it *is* the single-chip path with three kappa-sized kernels
told which axis to reduce over.  Everything not kappa-sized runs replicated
per device (identical inputs + explicit PRNG keys ⇒ bit-identical
replicas), so transcripts match the single-chip prover byte for byte —
including big-q (two-limb Zq2 state pytrees) and Fiat-Shamir modes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def shard_map(f, *, mesh, in_specs, out_specs):
    # jax >= 0.8 moved shard_map out of experimental and renamed
    # check_rep -> check_vma; support both without a deprecation warning.
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map as _sm
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)

from ..params import LabradorParams
from ..protocol import AxisCtx
from ..prover import prove_impl
from ..verifier import verify_report_impl
from ..oracle import InteractiveOracle, FiatShamirOracle


def _row_ctx(mesh: Mesh) -> AxisCtx:
    return AxisCtx(axis="rows", n_shards=mesh.shape["rows"])


def make_sharded_prover(params: LabradorParams, mesh: Mesh,
                        decomp_mode: str = "reference",
                        oracle: str = "interactive",
                        kernel_backend: str = "auto"):
    """Returns a jitted function

        fn(witness (B,r,n,d), state (B-batched pytree), crs_keys (B,2),
           verifier_keys (B,...)) -> Transcript batch

    with the proof batch sharded over the mesh's ``dp`` axis and the
    kappa-sized phases sharded over ``rows``.  ``oracle``: "interactive"
    (challenges from the per-instance verifier key — the reference's model)
    or "fs" (SHA-256 Fiat-Shamir; the verifier key is ignored).  Big-q
    (Zq2) states work unchanged — prove_impl's pytree handling is shared.
    """
    from ..crs import CRS
    ctx = _row_ctx(mesh)
    assert params.kappa % ctx.n_shards == 0, \
        f"kappa={params.kappa} must divide rows={ctx.n_shards}"

    def per_instance(witness, state, crs_key, vkey):
        crs = CRS(key=crs_key, params=params)
        if oracle == "fs":
            orc = FiatShamirOracle.create(crs_key, state, params)
        elif oracle == "interactive":
            orc = InteractiveOracle(vkey=vkey)
        else:
            raise ValueError(f"unknown oracle {oracle!r}")
        return prove_impl(params, witness, state, crs, orc,
                          decomp_mode=decomp_mode,
                          kernel_backend=kernel_backend, ctx=ctx)

    def batched(witness_b, state_b, crs_keys_b, vkeys_b):
        return jax.vmap(per_instance)(witness_b, state_b, crs_keys_b,
                                      vkeys_b)

    f = shard_map(
        batched, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"),
    )
    return jax.jit(f)


def make_sharded_verifier(params: LabradorParams, mesh: Mesh,
                          decomp_mode: str = "reference",
                          norm_mode: str = "exact"):
    """Returns a jitted ``fn(state, proof, crs_key) -> {check: bool}`` with
    the CRS-re-expanding checks (15/19/20 — the rayon-parallel site of
    ``verification.rs:372-415``) row-sharded over the mesh's ``rows`` axis.
    State/proof are single instances, replicated across the mesh (the
    verifier's non-CRS work is negligible)."""
    from ..crs import CRS
    ctx = _row_ctx(mesh)
    assert params.kappa % ctx.n_shards == 0, \
        f"kappa={params.kappa} must divide rows={ctx.n_shards}"

    def core(state, proof, crs_key):
        crs = CRS(key=crs_key, params=params)
        return verify_report_impl(params, state, proof, crs,
                                  decomp_mode=decomp_mode,
                                  norm_mode=norm_mode, ctx=ctx)

    f = shard_map(
        core, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
    )
    return jax.jit(f)
