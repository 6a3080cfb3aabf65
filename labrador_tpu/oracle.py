"""Challenge oracles: interactive and Fiat-Shamir.

The reference is explicitly interactive ("no Fiat-Shamir yet",
``/root/reference/README.md:12``): the prover holds a live ``&Verifier``
and pulls randomness from its thread-RNG mid-protocol.  Here the oracle is
a first-class object threaded through the prover:

  * ``InteractiveOracle`` — challenges from a verifier PRNG key, ignoring
    the transcript (the reference's model, with explicit keys).
  * ``FiatShamirOracle`` — challenges from a SHA-256 running hash of the
    protocol messages (u1 -> JL; (Pi, p) -> psi/omega; b'' -> alpha/beta;
    u2 -> c), making the proof non-interactive.  The verifier re-derives
    every challenge from the transcript and rejects mismatches
    (verifier.fs_challenge_report).

Both are pytree dataclasses usable inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .ops.sha256 import hash_arrays
from .ops.sha_prng import wrap_digest

# absorption domains (message order)
DOM_INIT = 1
DOM_U1 = 2
DOM_JL = 3
DOM_BPP = 4
DOM_U2 = 5
_DOM_KEY = 0xFF


def _fold2(key, tag, idx):
    return jax.random.fold_in(jax.random.fold_in(key, tag), idx)


@struct.dataclass
class InteractiveOracle:
    vkey: jax.Array  # jax PRNG key

    def init(self) -> jax.Array:
        return jnp.zeros((8,), jnp.uint32)  # state unused

    def absorb(self, st, domain: int, arrays) -> jax.Array:
        return st

    def challenge_key(self, st, tag: int, idx=0) -> jax.Array:
        return _fold2(self.vkey, tag, idx)


@struct.dataclass
class FiatShamirOracle:
    seed: jax.Array  # (8,) uint32 initial sponge state

    @classmethod
    def create(cls, crs_key: jax.Array, state=None,
               params=None) -> "FiatShamirOracle":
        """Initial sponge state binds the CRS seed and — when given — the
        statement (the State's constraint families) and the parameter set,
        so challenges cannot be reused across statements or configs
        (FS_SPEC.md §2).  ``state=None`` keeps the legacy CRS-only binding
        for internal callers that bind the statement elsewhere."""
        msgs = [jnp.asarray(crs_key, jnp.uint32)]
        if params is not None:
            p = params
            msgs.append(jnp.asarray(
                [p.q & 0xFFFFFFFF, p.q >> 32, p.d, p.n, p.r, p.kappa,
                 p.b, p.t_1, p.b_1, p.t_2, p.b_2, p.k_count, p.l_count],
                jnp.uint32))
        if state is not None:
            msgs.extend(jnp.asarray(leaf) for leaf in jax.tree.leaves(state))
        return cls(seed=hash_arrays(*msgs, domain=DOM_INIT))

    def init(self) -> jax.Array:
        return self.seed

    def absorb(self, st, domain: int, arrays) -> jax.Array:
        return hash_arrays(st, *arrays, domain=domain)

    def challenge_key(self, st, tag: int, idx=0) -> jax.Array:
        d = hash_arrays(st, jnp.asarray(tag, jnp.uint32).reshape(1),
                        jnp.asarray(idx, jnp.uint32).reshape(1),
                        domain=_DOM_KEY)
        # the FULL 256-bit digest becomes the sampler key via the SHA-256
        # counter-mode PRNG impl (ops/sha_prng.py) — round 3 truncated to
        # d[:2] to fit a threefry2x32 key, collapsing transcript-grinding
        # resistance to 2^64 (FS_SPEC.md §5)
        return wrap_digest(d)
