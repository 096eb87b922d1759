"""Checkpoint / resume for solver state.

The reference has no checkpointing (SURVEY.md §5): its warm-start lives in
mutable module buffers.  Our :class:`MPPIState` is an explicit pytree, so
persistence is a flat leaf dump: :func:`save_state` writes the leaves to an
``.npz``; :func:`load_state` restores them into the structure of a template
state from ``solver.init()``.  Works for any pytree (including the batched
scenario states from ``parallel.make_batched_solver``).
"""

from __future__ import annotations

import numpy as np
import jax


def save_state(path: str, state) -> str:
    """Persist a solver-state pytree to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    return path if path.endswith(".npz") else path + ".npz"


def load_state(path: str, template):
    """Restore a pytree saved by :func:`save_state`.

    Args:
        template: a pytree with the target structure (e.g. ``solver.init()``)
            whose leaves define shapes/dtypes.
    """
    with np.load(path if path.endswith(".npz") else path + ".npz") as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(template)
    template_leaves = jax.tree_util.tree_leaves(template)
    if len(leaves) != len(template_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; template expects "
            f"{len(template_leaves)}"
        )
    for i, (leaf, tmpl) in enumerate(zip(leaves, template_leaves)):
        if tuple(leaf.shape) != tuple(jax.numpy.shape(tmpl)):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(leaf.shape)}; template "
                f"expects {tuple(jax.numpy.shape(tmpl))} — was this state "
                "saved from a different solver config?"
            )
    restored = [
        jax.numpy.asarray(leaf, tmpl.dtype)
        for leaf, tmpl in zip(leaves, template_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)
