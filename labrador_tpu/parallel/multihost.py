"""Multi-host (pod-slice) execution glue.

The reference is strictly single-process (SURVEY.md §5.8: rayon over shared
memory is its entire parallel story).  This framework scales the same
reductions across hosts: ``jax.distributed`` + a global (dp, rows) mesh,
with the rows axis laid out within slices so the u1/Ajtai psum rides ICI
while only dp-level traffic (none, for independent proofs) crosses DCN.

On a single host this degenerates to the local mesh; the 8-virtual-device
CPU emulation (tests/conftest.py) is the "fake cluster" layer used in CI.

Usage on each host of a pod slice:

    from labrador_tpu.parallel import multihost
    multihost.initialize()                    # jax.distributed handshake
    mesh = multihost.global_mesh(n_dp=2)      # all hosts' devices
    fn = make_sharded_prover(params, mesh)    # same API as single host
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-based defaults (a no-op if the
    runtime already auto-initialized, e.g. on Cloud TPU VMs)."""
    if jax.process_count() > 1:
        return
    kwargs = {}
    explicit = coordinator_address is not None
    if explicit:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Tolerate only the already-initialized case; an explicitly
        # configured pod must NOT silently degrade to single-process.
        if "already initialized" in str(e).lower():
            return
        if explicit:
            raise
        # env-autodetect path on a plain single host: nothing to join
        if num_processes not in (None, 1):
            raise


def global_mesh(n_dp: int = 1) -> Mesh:
    """(dp, rows) mesh over every device in the job.  Device order from
    jax.devices() is host-major, so consecutive rows-axis entries stay on
    one host's chips (ICI) before wrapping to the next host (DCN) — the
    layout BASELINE.json config 4 asks for (commitment rows sharded across
    hosts only when a single host's chips are exhausted)."""
    return make_mesh(n_dp=n_dp, devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0
