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
    """Pickle the treedef + leaves (arrays -> numpy). ATOMIC: written to a
    temp file then os.replace'd — a kill mid-write (the exact scenario the
    resume machinery exists for) must never truncate the only
    checkpoint."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    leaves = [np.asarray(x) for x in leaves]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": leaves}, f)
    os.replace(tmp, path)


def load_pytree(path: str):
    import jax.numpy as jnp

    with open(path, "rb") as f:
        blob = pickle.load(f)
    leaves = [jnp.asarray(x) for x in blob["leaves"]]
    return jax.tree_util.tree_unflatten(blob["treedef"], leaves)


def make_state_saver(path: str, every: int = 1000):
    """state_hook for run_training: periodically persist the FULL training
    state {params, opt_state, step} so kill-and-resume reproduces the
    uninterrupted run (reference Lightning resume restores optimizer state
    and step too, train_brdf_crf.py:541-545)."""

    def hook(step, params, opt_state):
        if every > 0 and (step + 1) % every == 0:
            save_pytree(path, {"params": params, "opt_state": opt_state,
                               "step": np.int64(step + 1)})
    return hook


def load_train_state(state_path: str, params_path: str, params):
    """Resume helper: full state if present, else legacy params-only, else
    the given fresh params. Returns (params, opt_state|None, start_step)."""
    if os.path.exists(state_path):
        try:
            st = load_pytree(state_path)
            print(f"[resume] full state from {state_path} "
                  f"(step {int(st['step'])})")
            return st["params"], st["opt_state"], int(st["step"])
        except Exception as e:   # corrupt/partial state file
            print(f"[resume] unreadable state file {state_path}: {e}; "
                  "falling back")
    if os.path.exists(params_path):
        print(f"[resume] params only from {params_path} "
              "(optimizer state reset)")
        return load_pytree(params_path), None, 0
    return params, None, 0


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
