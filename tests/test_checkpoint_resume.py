"""Phase checkpoint/resume integrated into the prover (SURVEY.md §5.4).

``prove_checkpointed`` dispatches the same prove_phase1/2/3 functions that
``prove`` composes, persisting each phase's carry — so a preempted job
resumes mid-proof and still emits a transcript byte-identical to the
monolithic prover."""

import os

import numpy as np
import pytest
import jax

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs, prover, verifier
from labrador_tpu.crs import CRS
from labrador_tpu.utils import checkpoint
from labrador_tpu.utils.profiling import PhaseTimer

P = LabradorParams(n=2, r=2)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(2024)
    kw, ks, kv = jax.random.split(key, 3)
    witness = sampling.generate_witness(kw, P)
    state = structs.generate_state(ks, witness, P)
    crs = CRS.create(P, seed=0xCEC)
    return witness, state, crs, kv


def _assert_same_transcript(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_phased_matches_monolithic(setup):
    witness, state, crs, kv = setup
    want = prover.prove(P, witness, state, crs, kv)
    timer = PhaseTimer()
    got = prover.prove_checkpointed(P, witness, state, crs, kv, timer=timer)
    _assert_same_transcript(got, want)
    assert set(timer.phases) == {"p1_commitments", "p2_jl_aggregation_u2",
                                 "p3_opening"}
    assert all(v > 0 for v in timer.phases.values())


def test_resume_mid_proof(setup, tmp_path):
    """Kill the job after phase 1; the resumed run must skip phase 1 (its
    checkpoint is loaded, not recomputed) and produce the identical
    transcript."""
    witness, state, crs, kv = setup
    want = prover.prove(P, witness, state, crs, kv)
    path = str(tmp_path / "proof_ckpt.npz")

    # simulate preemption: run ONLY phase 1 by monkey-stopping after save
    from labrador_tpu.oracle import InteractiveOracle
    oracle = InteractiveOracle(vkey=kv)
    ost = oracle.init()
    ost, ph1 = prover._jit_phase1(P, witness, state, crs, oracle, ost,
                                  "reference", "xla")
    checkpoint.save(path, meta=dict(phases_done=1), ost=ost, ph1=ph1)
    assert checkpoint.load_meta(path)["phases_done"] == 1

    # resume: phase 1 must come from the checkpoint
    calls = {"p1": 0}
    orig = prover._jit_phase1

    def counting_phase1(*a, **k):
        calls["p1"] += 1
        return orig(*a, **k)

    prover._jit_phase1 = counting_phase1
    try:
        got = prover.prove_checkpointed(P, witness, state, crs, kv,
                                        ckpt_path=path)
    finally:
        prover._jit_phase1 = orig
    assert calls["p1"] == 0, "phase 1 was recomputed despite checkpoint"
    _assert_same_transcript(got, want)
    # the completed run left a phase-2 checkpoint behind
    assert checkpoint.load_meta(path)["phases_done"] == 2


def test_resume_after_phase2(setup, tmp_path):
    witness, state, crs, kv = setup
    want = prover.prove(P, witness, state, crs, kv)
    path = str(tmp_path / "ckpt2.npz")
    # full run with checkpointing leaves phases_done=2
    got1 = prover.prove_checkpointed(P, witness, state, crs, kv,
                                     ckpt_path=path)
    # resume from it: only phase 3 runs
    timer = PhaseTimer()
    got2 = prover.prove_checkpointed(P, witness, state, crs, kv,
                                     ckpt_path=path, timer=timer)
    assert set(timer.phases) == {"p3_opening"}
    _assert_same_transcript(got1, want)
    _assert_same_transcript(got2, want)
    rep = verifier.verify_report(P, state, got2, crs)
    assert bool(rep["all"])
