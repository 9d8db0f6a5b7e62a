"""Pytree checkpointing: save/restore model parameters and optimizer state.

The reference checkpoints only SEAL, via TF1 `Saver.save(...global_step=1000)`
and `import_meta_graph`/`latest_checkpoint` restore for inference
(`SEAL/model/gnn.py:198,213-214`; paths `constant.py:4-6`). Here every
trainer can checkpoint: parameters are JAX pytrees, serialized as one `.npz`
of leaves plus a JSON structure descriptor — dependency-free, portable, and
byte-stable. `latest_checkpoint` mirrors the TF helper's step-suffix
convention (`name-<step>`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree: Any, step: Optional[int] = None) -> str:
    """Save a pytree to `<path>[-<step>].npz` (+ `.tree.json`)."""
    if step is not None:
        path = f"{path}-{step}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = _flatten(tree)
    np.savez(
        path + ".npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    with open(path + ".tree.json", "w") as f:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves)}, f)
    return path + ".npz"


def restore_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (shapes/dtypes validated)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    leaves, treedef = _flatten(like)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, expected {len(leaves)}"
        )
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        expect = np.asarray(leaf)
        if arr.shape != expect.shape:
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != model {expect.shape}"
            )
        new_leaves.append(arr.astype(expect.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def latest_checkpoint(directory: str, prefix: str) -> Optional[str]:
    """Highest-step `<prefix>-<step>.npz` in `directory` (TF-style)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    pat = re.compile(re.escape(prefix) + r"-(\d+)\.npz$")
    for name in os.listdir(directory):
        m = pat.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(directory, name)
    return best
