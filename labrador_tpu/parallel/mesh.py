"""Mesh construction helpers.

The reference's only parallelism is two rayon ``par_iter`` sites over
(witness index, digit) pairs in the u1 computation and Check 19
(``proofgen.rs:101-124``, ``verification.rs:372-388``).  The TPU build's
axes (SURVEY.md §5.8):

  * ``dp``   — independent proof instances (data parallel),
  * ``rows`` — commitment rows / the kappa contraction axis of the Ajtai
               and outer-commitment matmuls (the rayon loops' analog, but
               sharded across chips with psum reductions over ICI).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_dp: int = 1, n_rows: int | None = None,
              devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    if n_rows is None:
        n_rows = len(devices) // n_dp
    assert n_dp * n_rows <= len(devices), (
        f"mesh {n_dp}x{n_rows} needs more than {len(devices)} devices")
    dev = np.asarray(devices[: n_dp * n_rows]).reshape(n_dp, n_rows)
    return Mesh(dev, ("dp", "rows"))
