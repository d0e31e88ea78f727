"""Checkpoint save/restore for parameter pytrees.

Replaces pytorch-lightning's ModelCheckpoint/resume flow
(train_brdf_crf.py:539-545). Numpy-npz based: dependency-free, portable
across hosts/backends, and stage artifacts stay individually inspectable
(matching the reference's vslf.npz / emitter.pth style, SURVEY.md §5).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Pickle the treedef + npz the leaves (arrays -> numpy)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    leaves = [np.asarray(x) for x in leaves]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": leaves}, f)


def load_pytree(path: str):
    import jax.numpy as jnp

    with open(path, "rb") as f:
        blob = pickle.load(f)
    leaves = [jnp.asarray(x) for x in blob["leaves"]]
    return jax.tree_util.tree_unflatten(blob["treedef"], leaves)


def load_into(path: str, template):
    """Restore leaves into an existing pytree structure (shape-checked)."""
    loaded = load_pytree(path)
    l_new = jax.tree_util.tree_leaves(loaded)
    l_tmpl, treedef = jax.tree_util.tree_flatten(template)
    assert len(l_new) == len(l_tmpl), "checkpoint/template structure mismatch"
    import jax.numpy as jnp
    out = [jnp.asarray(a).reshape(b.shape).astype(b.dtype)
           for a, b in zip(l_new, l_tmpl)]
    return jax.tree_util.tree_unflatten(treedef, out)
