"""GSPMD sharding of the incremental problem over a device mesh.

The reference's distributed story is MPI domain decomposition inherited from
dolfinx/PETSc: partitioned meshes, ghost cells, `scatter_forward` halo
exchanges after every state write, and `comm.allreduce` norms (SURVEY §2.4,
§5.8). The TPU-native equivalent implemented here:

  * every per-cell/per-QP array (tabulated gradients, QP weights, dofmaps,
    stress, tangents, history) is sharded along its leading cell axis with a
    `NamedSharding` over a 1-D `jax.sharding.Mesh`;
  * the global dof vectors (u, residual, f_ext) are replicated;
  * XLA's SPMD partitioner turns the segment-sum assembly into a local
    scatter-add followed by an all-reduce over ICI — the analog of ghost
    accumulation — and the CG dot products into `psum`s. No hand-written
    halo exchange is needed because assembly is an additive gather/scatter,
    not a stencil.

There is no analog of elastic training / NCCL / ring collectives to build:
one jitted program runs on all devices (single-program multiple-data), and
determinism follows from the fixed reduction topology (validated by
tests/parallel/test_sharding.py against the reference's `mpirun -np 2`
equivalence test, test_solver_mpi.py:92-121).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_device_mesh", "shard_problem"]


def make_device_mesh(n_devices: int | None = None, axis: str = "cells") -> Mesh:
    """1-D device mesh over the first ``n_devices`` available devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), (axis,))


def _put(x, sharding):
    return jax.device_put(x, sharding)


def shard_problem(problem, mesh: Mesh, axis: str = "cells") -> None:
    """Shard a problem's arrays in place over ``mesh``.

    Cell/QP-axis arrays are split along ``axis``; dof vectors are replicated.
    All subsequently jitted solver steps run SPMD; results are numerically
    the single-device computation up to reduction-order rounding.

    Works with both engines of IncrSmallStrainProblem: the AoS layouts shard
    on their leading cell axis; the packed/structured SoA layouts shard on
    their trailing flat-QP / grid axis (components lead, the huge axis is
    minor-most — see ops/packed.py).
    """
    cells_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    warned_repl = [False]

    def last_axis_sh(a):
        """Shard an array on its LAST axis (packed/structured layouts);
        REPLICATE when the axis is not device-divisible (tiny meshes /
        odd grids) — replication is always correct, just not distributed."""
        if a.shape[-1] % mesh.size != 0:
            # structured grids have trailing axis M = prod(grid+1), odd for
            # even grids — falling back silently would degrade the whole
            # state to replication with no signal; warn once per problem
            if not warned_repl[0]:
                warned_repl[0] = True
                import warnings

                warnings.warn(
                    f"shard_problem: array of shape {a.shape} has a trailing "
                    f"axis not divisible by the {mesh.size}-device mesh — "
                    "replicating it (and any same-shaped arrays) instead of "
                    "distributing. Pick a mesh size with trailing QP/node "
                    "axes divisible by the device count to shard fully.",
                    stacklevel=3,
                )
            return _put(a, repl)
        return _put(a, NamedSharding(mesh, P(*([None] * (a.ndim - 1)), axis)))

    def shard_geo(geo):
        import dataclasses

        if hasattr(geo, "matvec_gm"):  # structured/lattice stencil engines
            updates = {
                "KEPS_c": _put(geo.KEPS_c, repl),
                "KDIV_c": _put(geo.KDIV_c, repl),
            }
            if hasattr(geo, "mask"):
                updates["mask"] = last_axis_sh(geo.mask)
            if hasattr(geo, "cell_index"):
                # cell_index [C] is observation-only (extract/insert_cells)
                # and C is rarely device-divisible: replicate
                updates["cell_index"] = _put(geo.cell_index, repl)
            if hasattr(geo, "w") and geo.w is not None:
                updates["w"] = _put(geo.w, repl)
            if getattr(geo, "KE_I", None) is not None:
                # folded constant-coefficient element matrices (small): keep
                # every registered data leaf explicitly placed
                updates["KE_I"] = _put(geo.KE_I, repl)
                updates["KE_V"] = _put(geo.KE_V, repl)
            return dataclasses.replace(geo, **updates)
        # packed: flat-QP arrays shard; small constants/plans replicate
        return dataclasses.replace(
            geo,
            dN=_put(geo.dN, repl) if geo.uniform else last_axis_sh(geo.dN),
            w=last_axis_sh(geo.w),
            dofmap_t=last_axis_sh(geo.dofmap_t),
            gather_idx=_put(geo.gather_idx, repl),
        )

    if getattr(problem, "engine", "aos") == "packed":
        problem._pk_geos = tuple(shard_geo(geo) for geo in problem._pk_geos)
        problem._stress_prev = tuple(
            last_axis_sh(s) for s in problem._stress_prev
        )
        problem._stress_curr = tuple(
            last_axis_sh(s) for s in problem._stress_curr
        )
        problem._histories = tuple(
            None
            if h is None
            else {k: last_axis_sh(v) for k, v in h.items()}
            for h in problem._histories
        )
        problem._histories_trial = problem._histories
    else:
        problem._law_data = tuple(
            (
                _put(dofmap, cells_sh),
                jax.tree.map(lambda a: _put(a, cells_sh), geo),
                _put(cells, cells_sh),
            )
            for (dofmap, geo, cells) in problem._law_data
        )
        problem._stress_prev = _put(problem._stress_prev, cells_sh)
        problem._stress_curr = _put(problem._stress_curr, cells_sh)
        problem._histories = tuple(
            None
            if h is None
            else {k: _put(v, cells_sh) for k, v in h.items()}
            for h in problem._histories
        )
        problem._histories_trial = problem._histories
        problem._w_detJ_global = _put(problem._w_detJ_global, cells_sh)
    problem.u = _put(problem.u, repl)
    problem.u_prev = _put(problem.u_prev, repl)
    problem.f_ext = _put(problem.f_ext, repl)
