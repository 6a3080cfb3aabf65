"""Transcript save/load and phase checkpointing round-trips."""

import os
import tempfile

import numpy as np
import jax

from labrador_tpu.params import LabradorParams
from labrador_tpu import sampling, structs
from labrador_tpu.utils import checkpoint

P = LabradorParams(n=2, r=2)


def test_state_from_constraints_matches_generate():
    key = jax.random.key(4)
    w = sampling.generate_witness(key, P)
    st = structs.generate_state(jax.random.key(5), w, P)
    st2 = structs.state_from_constraints(st.a_k, st.phi_k, w, P)
    np.testing.assert_array_equal(np.asarray(st.b_k), np.asarray(st2.b_k))


def test_checkpoint_roundtrip():
    key = jax.random.key(6)
    w = sampling.generate_witness(key, P)
    st = structs.generate_state(jax.random.key(7), w, P)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        checkpoint.save(path, witness=w, state=st)
        assert checkpoint.exists(path)
        out = checkpoint.load(path, witness=w, state=st)
        np.testing.assert_array_equal(np.asarray(out["witness"]),
                                      np.asarray(w))
        np.testing.assert_array_equal(np.asarray(out["state"].b_k),
                                      np.asarray(st.b_k))


def test_transcript_save_load():
    from labrador_tpu import prover
    from labrador_tpu.crs import CRS
    key = jax.random.key(8)
    kw, ks, kv = jax.random.split(key, 3)
    w = sampling.generate_witness(kw, P)
    st = structs.generate_state(ks, w, P)
    crs = CRS.create(P, seed=0x10AD)
    proof = prover.prove(P, w, st, crs, kv)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tr.npz")
        structs.save_transcript(jax.device_get(proof), path)
        back = structs.load_transcript(path)
        np.testing.assert_array_equal(np.asarray(back.z), np.asarray(proof.z))
        np.testing.assert_array_equal(np.asarray(back.u_1),
                                      np.asarray(proof.u_1))
