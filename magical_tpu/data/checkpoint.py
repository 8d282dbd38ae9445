"""Checkpoint / resume for env state and training state.

The reference's only persistence is demo pickling (SURVEY.md §5); here
env state is an explicit array pytree, so checkpointing is direct: orbax
when available, a numpy ``.npz`` fallback otherwise.  Works for a single
`EnvState`, a batched `EnvCarry`, or any pytree of arrays (e.g. BC/GAIL
train states).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree) -> str:
    """Save any array pytree.  Uses orbax if importable, else npz+pickle."""
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        path = os.path.abspath(path)
        ckpt.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)
        ckpt.wait_until_finished()
        return path
    except Exception:
        leaves, treedef = _flatten(tree)
        os.makedirs(os.path.dirname(os.path.abspath(path)) or '.',
                    exist_ok=True)
        np.savez_compressed(
            path + '.npz',
            **{f'leaf_{i}': np.asarray(x) for i, x in enumerate(leaves)})
        with open(path + '.treedef', 'wb') as f:
            pickle.dump(treedef, f)
        return path + '.npz'


def load_pytree(path: str, like=None):
    """Load a pytree saved by save_pytree.  `like` (an example pytree) is
    required for the orbax path."""
    if os.path.exists(path + '.npz'):
        with open(path + '.treedef', 'rb') as f:
            treedef = pickle.load(f)
        data = np.load(path + '.npz')
        leaves = [data[f'leaf_{i}'] for i in range(len(data.files))]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        like = jax.tree_util.tree_map(np.asarray, like)
        return ckpt.restore(os.path.abspath(path), like)
    return ckpt.restore(os.path.abspath(path))
