"""GSPMD sharding of the packed/structured production path.

The conv-based structured engine shards over the spatial grid: XLA's SPMD
partitioner inserts the halo exchanges for the stencil convs automatically
(the ICI analog of the reference's ghost-cell scatter_forward). This test
runs the fully-jitted packed step with all QP state sharded over an 8-device
mesh and pins it to the unsharded result.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.bcs import combine_bcs
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.solver.packed_step import (
    build_packed_problem,
    make_packed_step,
)

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def build(n=7):
    # n odd so the flat node axis M = (n+1)^3 is divisible by the 8-device mesh
    mesh = unit_cube_mesh(n, n, n, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.008),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    law = VonMises3D(MAT)
    geos, models, state = build_packed_problem(V, law, q_degree=2)
    bc_dofs, bc_vals = combine_bcs(bcs)
    return V, geos, models, state, jnp.asarray(bc_dofs), jnp.asarray(bc_vals)


def run_steps(jitted, state, n_steps=3):
    for _ in range(n_steps):
        state, stats = jitted(state)
    return state


def test_structured_step_sharded_matches_unsharded():
    assert len(jax.devices()) >= 8
    V, geos, models, state, bcd, bcv = build()
    step = make_packed_step(geos, newton_rtol=1e-10, cg_rtol=1e-12, cg_maxiter=2000)
    fx = jnp.zeros(V.ndofs, state.u.dtype)
    dt = jnp.asarray(1.0, state.u.dtype)
    jitted = jax.jit(lambda st: step(models, st, bcd, bcv, fx, dt))

    ref = run_steps(jitted, state)

    # shard: QP fields [comp, Q, M] split on the flat node axis; dof vectors
    # replicated. The corner shift-slices get their halos from the SPMD
    # partitioner (pad + static slice -> collective-permute).
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
    qp_sh = NamedSharding(mesh, P(None, None, "x"))
    repl = NamedSharding(mesh, P())
    state_sh = jax.device_put(
        state,
        type(state)(
            u=repl,
            stress=tuple(qp_sh for _ in state.stress),
            histories=tuple(
                {k: qp_sh for k in h} if h is not None else None
                for h in state.histories
            ),
            t=repl,
        ),
    )
    sharded = run_steps(jitted, state_sh)

    rel = np.linalg.norm(np.asarray(sharded.u) - np.asarray(ref.u)) / np.linalg.norm(
        np.asarray(ref.u)
    )
    assert rel < 1e-13, rel
    assert float(jnp.max(sharded.histories[0]["alpha"])) > 0  # plasticity happened


def test_windowed_step_sharded_matches_unsharded():
    """The windowed engine's QP state shards on its flat [s, N] axis (N =
    Q * C_pad with C_pad a multiple of 128, so any device count divides);
    the step runs SPMD and matches single-device at the MPI-determinism
    bar. (CPU backend: the exchange runs its XLA reference path — the
    Pallas kernels are the TPU specialization of the same plan.)"""
    from fenics_constitutive_tpu.fem.mesh import Mesh as FeMesh

    assert len(jax.devices()) >= 8
    box = unit_cube_mesh(6, 6, 6, "tetra")
    rng = np.random.default_rng(0)
    pi = rng.permutation(box.num_nodes)
    nodes = np.empty_like(box.nodes)
    nodes[pi] = box.nodes
    mesh = FeMesh(nodes, pi[box.cells].astype(np.int32), "tetra")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.008),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    geos, models, state = build_packed_problem(
        V, VonMises3D(MAT), q_degree=2, engine="windowed"
    )
    assert hasattr(geos[0], "to_internal")
    bcd, bcv = (jnp.asarray(a) for a in combine_bcs(bcs))
    step = make_packed_step(
        geos, newton_rtol=1e-10, cg_rtol=1e-12, cg_maxiter=2000
    )
    fx = jnp.zeros_like(state.u)  # windowed f_ext is INTERNAL-layout
    dt = jnp.asarray(1.0, state.u.dtype)
    jitted = jax.jit(lambda st: step(models, st, bcd, bcv.astype(state.u.dtype), fx, dt))

    ref = run_steps(jitted, state)

    mesh8 = Mesh(np.array(jax.devices()[:8]).reshape(8), ("x",))
    qp_sh = NamedSharding(mesh8, P(None, "x"))  # [s, N] flat QP axis
    repl = NamedSharding(mesh8, P())
    state_sh = jax.device_put(
        state,
        type(state)(
            u=repl,
            stress=tuple(qp_sh for _ in state.stress),
            histories=tuple(
                {k: qp_sh for k in h} if h is not None else None
                for h in state.histories
            ),
            t=repl,
        ),
    )
    sharded = run_steps(jitted, state_sh)
    rel = np.linalg.norm(
        np.asarray(sharded.u) - np.asarray(ref.u)
    ) / np.linalg.norm(np.asarray(ref.u))
    assert rel < 1e-12, rel
    assert float(jnp.max(sharded.histories[0]["alpha"])) > 0
