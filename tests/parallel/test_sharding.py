"""Distributed-correctness test: sharded-vs-single-device equivalence.

The reference validates MPI domain decomposition by running the same 4x6x7-cube
plasticity problem on COMM_WORLD (partitioned) and COMM_SELF (serial) and
asserting relative L2 difference < 1e-14 (tests/solver/test_solver_mpi.py:92-121).
Here the partitioning is a GSPMD NamedSharding over 8 virtual CPU devices and
the comparison is against the unsharded run of the identical program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.parallel import make_device_mesh, shard_problem
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def build_problem():
    mesh = unit_cube_mesh(4, 6, 7, "tetra")  # 1008 cells, like the MPI test mesh
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bc_move = DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    return IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 1, engine="aos"), bc_move


def run(problem, bc_move, n_steps=10):
    for k in range(1, n_steps + 1):
        bc_move.value = 0.05 * k / n_steps
        # extra-tight tolerances: both runs must land on the same Newton fixed
        # point so only reduction-order rounding differs
        niter, converged = problem.solve(rtol=1e-14, atol=1e-12, cg_rtol=1e-15)
        assert converged
        problem.update()
    return np.asarray(problem.u)


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"

    problem_ref, bc_ref = build_problem()
    u_ref = run(problem_ref, bc_ref)

    problem_sh, bc_sh = build_problem()
    mesh = make_device_mesh(8)
    shard_problem(problem_sh, mesh)
    u_sh = run(problem_sh, bc_sh)

    rel = np.linalg.norm(u_sh - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-14, rel
    # plasticity actually happened (the test is not vacuous)
    assert float(jnp.max(problem_sh._histories[0]["alpha"])) > 0.0


def test_sharded_state_stays_sharded():
    """update() must not silently gather state back to one device."""
    problem, bc = build_problem()
    mesh = make_device_mesh(8)
    shard_problem(problem, mesh)
    bc.value = 0.01
    problem.solve()
    problem.update()
    sharding = problem._stress_prev.sharding
    assert not sharding.is_fully_replicated
