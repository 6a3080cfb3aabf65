"""labrador_tpu — a TPU-native LaBRADOR proof system (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of RatioAeterna/LaBRADOR-SNARK
(Beullens–Seiler, CRYPTO 2023) for TPU hardware: ring arithmetic in
Rq = Zq[X]/(X^d+1) as batched CRT-NTT matmuls on the MXU, a virtual
counter-PRG CRS expanded on device, fully jittable prover/verifier with
explicit PRNG keys, and shard_map parallelism over commitment rows.
"""

from .params import LabradorParams, find_suitable_prime, D, TAU, T_OPNORM

__all__ = [
    "LabradorParams",
    "find_suitable_prime",
    "D",
    "TAU",
    "T_OPNORM",
]

__version__ = "0.1.0"
