"""Checkpoint / resume for solver state.

The reference has no checkpointing (SURVEY.md §5): its warm-start lives in
mutable module buffers.  Our :class:`MPPIState` is an explicit pytree, so
persistence is a flat leaf dump.  Two interchangeable backends:

* :func:`save_state` / :func:`load_state` — single-file ``.npz``; leaves
  are gathered to the host.  Zero extra dependencies, right for
  single-chip controller state (a few KB).
* :func:`save_state_orbax` / :func:`load_state_orbax` — an Orbax
  directory checkpoint.  Restore places every leaf with the *template's*
  sharding, so a fleet/scenario state sharded over a
  :class:`jax.sharding.Mesh` round-trips without a host gather — the
  production path for large batched serving states.

Both work for any pytree (including the batched scenario states from
``parallel.make_batched_solver``).
"""

from __future__ import annotations

import os

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


# ----------------------------------------------------------------------
# Orbax backend (directory checkpoints, sharding-aware restore)
# ----------------------------------------------------------------------

_ORBAX_CHECKPOINTER = None


def _orbax_checkpointer():
    """One lazily-built StandardCheckpointer shared by all calls (it owns
    a background commit thread; one per process is the intended usage)."""
    global _ORBAX_CHECKPOINTER
    if _ORBAX_CHECKPOINTER is None:
        import orbax.checkpoint as ocp

        _ORBAX_CHECKPOINTER = ocp.StandardCheckpointer()
    return _ORBAX_CHECKPOINTER


def save_state_orbax(path: str, state, *, wait: bool = True) -> str:
    """Persist a solver-state pytree as an Orbax directory checkpoint.

    Args:
        path: checkpoint directory (created; overwritten if it exists).
        state: any pytree of arrays (e.g. ``solver.solve(...).state``, or a
            mesh-sharded fleet state).
        wait: block until the checkpoint is durably committed.  With
            ``wait=False`` the write completes in the background (Orbax's
            async commit) — call this again or ``wait_until_saved`` before
            reading it back.
    """
    path = os.path.abspath(path)
    ckptr = _orbax_checkpointer()
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def wait_until_saved() -> None:
    """Join any in-flight ``save_state_orbax(..., wait=False)`` commits."""
    if _ORBAX_CHECKPOINTER is not None:
        _ORBAX_CHECKPOINTER.wait_until_finished()


def load_state_orbax(path: str, template):
    """Restore a pytree saved by :func:`save_state_orbax`.

    Every leaf is restored with the shape, dtype, AND sharding of the
    corresponding ``template`` leaf — a state sharded over a device mesh
    comes back sharded, with no intermediate host gather.

    Args:
        template: a pytree with the target structure (e.g. ``solver.init()``
            or a sharded fleet state) whose leaves define shapes/dtypes/
            shardings.
    """
    ckptr = _orbax_checkpointer()
    try:
        return ckptr.restore(os.path.abspath(path), template)
    except ValueError as exc:
        raise ValueError(
            f"checkpoint at {path!r} does not match the template state "
            "(was it saved from a different solver config?): "
            f"{exc}"
        ) from exc
