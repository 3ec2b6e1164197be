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

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import VonMises3D
from fenics_constitutive_tpu.parallel import make_device_mesh, shard_problem
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem
import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_packed_engine_problem_sharded_matches_unsharded():
    """shard_problem on the DEFAULT (packed) engine: an interactive solve
    with all SoA arrays sharded over 8 devices matches the unsharded run."""
    import jax

    mesh = unit_cube_mesh(7, 7, 7, "hex")  # 8x8x8 = 512 grid nodes: 8-divisible
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    def build():
        bc_move = DirichletBC(
            V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
        )
        bcs = [
            DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
            bc_move,
            DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
            DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
        ]
        return IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 1), bc_move

    def run(problem, bc_move, n_steps=3):
        for k in range(1, n_steps + 1):
            bc_move.value = 0.02 * k / n_steps
            niter, converged = problem.solve()
            assert converged
            problem.update()
        return (
            np.asarray(problem.u),
            np.asarray(problem.stress_0),
            np.asarray(problem._history_0[0]["alpha"]),
        )

    p_ref, mv_ref = build()
    u_ref, s_ref, a_ref = run(p_ref, mv_ref)

    p_sh, mv_sh = build()
    assert p_sh.engine == "packed"
    dmesh = make_device_mesh(8)
    shard_problem(p_sh, dmesh)
    assert not p_sh._stress_prev[0].sharding.is_fully_replicated
    u_sh, s_sh, a_sh = run(p_sh, mv_sh)

    # the PHYSICAL state is reduction-order-exact: stresses to ~4e-15
    # relative, hardening variable to machine precision
    np.testing.assert_allclose(s_sh, s_ref, rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(a_sh, a_ref, rtol=0, atol=1e-14)
    # u is non-unique HERE BY CONSTRUCTION: this test runs q_degree=1, and
    # 1-point-quadrature hexes have hourglass (zero-energy) modes the
    # residual cannot see, so different reduction orders park different
    # hourglass content in u while the physical fields match exactly
    # (verified: the serial problem's residual evaluated at the sharded u is
    # 7e-13 — both displacements solve the same equations). The
    # unique-solution tests below prove the engine itself is deterministic
    # to 1e-12 (reference MPI bar, test_solver_mpi.py:119).
    rel = np.linalg.norm(u_sh - u_ref) / np.linalg.norm(u_ref)
    assert rel < 5e-3, rel
    # residual identity: BOTH runs' accepted residuals meet the same absolute
    # bound, so the u discrepancy is solution-set null space, not error
    assert p_ref.last_stats["r_norm"] <= 1e-9, p_ref.last_stats
    assert p_sh.last_stats["r_norm"] <= 1e-9, p_sh.last_stats


def _build_packed(law, n=7):
    """Production (packed/structured) engine problem on an 8-divisible grid.

    q_degree=2 (full 2x2x2 integration): 1-point-quadrature hexes have
    hourglass (zero-energy) modes, under which u is non-unique and a
    sharded-vs-serial comparison measures the null-space component, not the
    engine (measured: q=1 rel_u ~2e-3 with stresses matching to 2e-15 and
    the cross-evaluated residual at the other run's u at 7e-13; q=2 rel_u
    7e-17)."""
    mesh = unit_cube_mesh(n, n, n, "hex")  # (n+1)^3 = 512 grid nodes for n=7
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
    problem = IncrSmallStrainProblem(law, V, bcs, 2)
    assert problem.engine == "packed"
    return problem, bc_move


def _run_tight(problem, bc_move, steps):
    """Drive load steps at extra-tight tolerances so both runs land on the
    same Newton fixed point and only reduction-order rounding differs."""
    for v in steps:
        bc_move.value = v
        niter, converged = problem.solve(rtol=1e-14, atol=1e-13, cg_rtol=1e-15)
        assert converged
        problem.update()
    return np.asarray(problem.u)


@pytest.mark.slow
def test_packed_engine_elastic_sharded_1e12():
    """PRODUCTION-engine determinism at the reference's MPI bar on a
    unique-solution (elastic) workload: rel L2 on u < 1e-12 — the packed
    engine's own version of test_solver_mpi.py:119's 1e-14 displacement
    assertion (the 5e-3 bound in the plastic test above is the hourglass
    null space of its q_degree=1 hexes, not engine noise; this test and the
    hardening one below prove it)."""
    from fenics_constitutive_tpu.models import Constraint, LinearElasticityModel

    def law():
        return LinearElasticityModel({"E": 42000.0, "nu": 0.3}, Constraint.FULL)

    p_ref, mv_ref = _build_packed(law())
    u_ref = _run_tight(p_ref, mv_ref, (0.01, 0.02))

    p_sh, mv_sh = _build_packed(law())
    shard_problem(p_sh, make_device_mesh(8))
    assert not p_sh._stress_prev[0].sharding.is_fully_replicated
    u_sh = _run_tight(p_sh, mv_sh, (0.01, 0.02))

    rel = np.linalg.norm(u_sh - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-12, rel


@pytest.mark.slow
def test_packed_engine_hardening_sharded_1e12():
    """Same bar on an ACTIVE-plasticity workload whose solution is unique:
    strong linear hardening (h ~ mu/2) keeps the consistent tangent uniformly
    SPD, so sharded and serial runs must agree to 1e-12 even past yield."""
    from fenics_constitutive_tpu.models import MisesPlasticityLinearHardening3D

    def law():
        return MisesPlasticityLinearHardening3D(
            {"mu": 80769.0, "kappa": 175000.0, "y_0": 1200.0, "h": 40000.0}
        )

    p_ref, mv_ref = _build_packed(law())
    u_ref = _run_tight(p_ref, mv_ref, (0.01, 0.02, 0.03))

    p_sh, mv_sh = _build_packed(law())
    shard_problem(p_sh, make_device_mesh(8))
    u_sh = _run_tight(p_sh, mv_sh, (0.01, 0.02, 0.03))

    # plasticity actually happened (the test is not vacuous)
    assert float(np.asarray(p_ref._histories[0]["alpha"]).max()) > 0.0
    rel = np.linalg.norm(u_sh - u_ref) / np.linalg.norm(u_ref)
    assert rel < 1e-12, rel


@pytest.mark.slow
def test_p2_lattice_engine_sharded_matches_unsharded():
    """GSPMD sharding of the degree-2 lattice conv engine: cell QP fields
    shard on the trailing cell axis; XLA partitions the stride-2 convs."""
    mesh = unit_cube_mesh(4, 4, 4, "hex")  # C = 64: 8-divisible
    V = FunctionSpace(mesh, 2, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    def build():
        bc_move = DirichletBC(
            V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
        )
        bcs = [
            DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
            bc_move,
            DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
            DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
        ]
        return IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 4), bc_move

    def run(problem, bc_move):
        for k in (1, 2):
            bc_move.value = 0.005 * k
            niter, converged = problem.solve()
            assert converged
            problem.update()
        return np.asarray(problem.stress_0), np.asarray(
            problem._history_0[0]["alpha"]
        )

    from fenics_constitutive_tpu.ops.structured import LatticeGeometry

    p_ref, mv_ref = build()
    assert isinstance(p_ref._pk_geos[0], LatticeGeometry)
    s_ref, a_ref = run(p_ref, mv_ref)

    p_sh, mv_sh = build()
    shard_problem(p_sh, make_device_mesh(8))
    assert not p_sh._stress_prev[0].sharding.is_fully_replicated
    s_sh, a_sh = run(p_sh, mv_sh)

    np.testing.assert_allclose(s_sh, s_ref, rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(a_sh, a_ref, rtol=0, atol=1e-13)
    assert a_ref.max() > 0  # plasticity happened
