"""Phase checkpoint/resume (SURVEY.md §5.4).

The reference has no checkpointing — its only persistence is transcript
serialization.  For long-running large-witness proofs this module saves
arbitrary named pytrees (witness, state, partial commitments) to a single
npz and restores them, so a preempted job resumes at the last phase
boundary instead of re-proving from scratch.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, meta: dict | None = None, **pytrees) -> None:
    """save('ckpt.npz', meta={'phases_done': 1}, witness=w, t=t, ...)
    ``meta`` is a small JSON dict (progress markers for resume)."""
    flat = {}
    if meta is not None:
        import json
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    for name, tree in pytrees.items():
        leaves, treedef = jax.tree.flatten(tree)
        flat[f"__treedef__{name}"] = np.frombuffer(
            repr(treedef).encode(), dtype=np.uint8)
        for i, leaf in enumerate(leaves):
            flat[f"{name}::{i}"] = np.asarray(leaf)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load(path: str, **templates):
    """load('ckpt.npz', witness=w_template, ...) -> dict of pytrees.

    Templates supply the tree structure; leaves are restored positionally.
    """
    out = {}
    with np.load(path) as z:
        for name, template in templates.items():
            leaves, treedef = jax.tree.flatten(template)
            restored = [jax.numpy.asarray(z[f"{name}::{i}"])
                        for i in range(len(leaves))]
            out[name] = jax.tree.unflatten(treedef, restored)
    return out


def load_meta(path: str) -> dict:
    import json
    with np.load(path) as z:
        if "__meta__" not in z:
            return {}
        return json.loads(z["__meta__"].tobytes().decode())


def exists(path: str) -> bool:
    return os.path.exists(path)
