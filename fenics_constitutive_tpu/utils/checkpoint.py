"""Checkpoint / resume for incremental simulations.

The reference has no first-class checkpoint subsystem; its committed state
(u_prev, stress_0, history_0, t) fully determines the next step and the MPI
test serializes fields with adios4dolfinx (SURVEY §5.4). Here the committed
state is one pytree, so checkpointing is a dict of arrays:

    save_checkpoint(path, problem.state_dict())
    problem.load_state_dict(load_checkpoint(path))

Plain ``.npz`` keeps zero extra dependencies; orbax is used when available for
large async checkpoints (it is in the baked environment but optional here).
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "state_dict",
    "load_state_dict",
]

_SEP = "::"


def save_checkpoint(path, tree) -> None:
    """Save a pytree of arrays to ``path`` (.npz)."""
    flat = {}

    def visit(subtree, prefix):
        if subtree is None:
            flat[prefix + "#none"] = np.zeros(0)
        elif isinstance(subtree, dict):
            for k, v in subtree.items():
                visit(v, f"{prefix}{k}{_SEP}")
        elif isinstance(subtree, (tuple, list)):
            for i, v in enumerate(subtree):
                visit(v, f"{prefix}{i}{_SEP}")
        else:
            flat[prefix + "#leaf"] = np.asarray(subtree)

    visit(tree, "")
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_checkpoint(path) -> dict:
    """Load a checkpoint into a nested dict mirroring the saved pytree.

    Tuples/lists come back as dicts keyed by stringified index; None leaves
    come back as None. Use load_state_dict to push into a problem.
    """
    data = np.load(path)
    root: dict = {}
    for key in data.files:
        body, kind = key.rsplit("#", 1)
        parts = [p for p in body.split(_SEP) if p]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leafname = parts[-1] if parts else ""
        node[leafname] = None if kind == "none" else jnp.asarray(data[key])
    return root


def save_checkpoint_orbax(path, tree) -> None:
    """Sharding-aware checkpoint via orbax (the production/multi-chip path).

    Unlike the zero-dependency npz fallback above — which gathers every
    array to host — orbax writes each shard from its owning device and the
    restore REAPPLIES the sharding (pass the live pytree as ``like=`` to
    :func:`load_checkpoint_orbax`), so a GSPMD-sharded simulation state
    round-trips without ever materializing on one host. This is the
    at-scale analog of the reference's adios4dolfinx MPI serialization
    (SURVEY §5.4)."""
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    ocp.PyTreeCheckpointer().save(p, _listify(tree), force=True)


def _listify(tree):
    """Tuples -> lists, recursively: orbax restores sequences as lists, so
    canonicalize both the saved tree and the ``like`` template to match."""
    if isinstance(tree, dict):
        return {k: _listify(v) for k, v in tree.items()}
    if isinstance(tree, (tuple, list)):
        return [_listify(v) for v in tree]
    return tree


def load_checkpoint_orbax(path, like=None):
    """Restore an orbax checkpoint.

    ``like``: optional template pytree (e.g. the problem's current
    ``state_dict``) whose shardings/dtypes the restored arrays adopt —
    REQUIRED to restore distributed: without it arrays land unsharded on
    the default device."""
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    if like is None:
        return ckptr.restore(p)
    restore_args = ocp.checkpoint_utils.construct_restore_args(_listify(like))
    return ckptr.restore(p, restore_args=restore_args)


def state_dict(problem) -> dict:
    """Snapshot the committed state of an IncrSmallStrainProblem."""
    return {
        "u": problem.u,
        "u_prev": problem.u_prev,
        "stress_prev": problem._stress_prev,
        "histories": list(problem._histories),
        "t": jnp.asarray(problem.sim_time.current),
        "dt": jnp.asarray(problem.sim_time.dt),
    }


def load_state_dict(problem, state: dict) -> None:
    """Restore a snapshot produced by state_dict (or load_checkpoint of one)."""
    problem.u = jnp.asarray(state["u"])
    problem.u_prev = jnp.asarray(state["u_prev"])
    sp = state["stress_prev"]
    if isinstance(sp, dict):  # loaded from npz: tuple came back index-keyed
        sp = tuple(sp[str(i)] for i in range(len(sp)))
    if isinstance(sp, (tuple, list)):  # packed engine: per-law stress fields
        problem._stress_prev = tuple(jnp.asarray(x) for x in sp)
    else:  # aos engine: one [C, Q, s] array
        problem._stress_prev = jnp.asarray(sp)
    problem._stress_curr = problem._stress_prev
    hist = state["histories"]
    if isinstance(hist, dict):  # loaded from npz: indices as keys
        hist = [hist[str(i)] for i in range(len(hist))]
    restored = []
    for h in hist:
        restored.append(None if h is None or h == {} else
                        {k: jnp.asarray(v) for k, v in h.items()})
    problem._histories = tuple(restored)
    problem._histories_trial = problem._histories
    problem.sim_time.current = float(state["t"])
    problem.sim_time.dt = float(state["dt"])
