"""Integration tests: analytic elasticity BVPs for all five constraints.

Mirrors /root/reference/tests/models/test_elasticity.py (uniaxial stress with a
second load step, two-material bar, uniaxial strain incl. 3D-wrapper
equivalence, plane strain/stress, 3D against an independent direct solve), with
the reference's tolerances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    unit_cube_mesh,
    unit_interval_mesh,
    unit_square_mesh,
)
from fenics_constitutive_tpu.models import (
    Constraint,
    LinearElasticityModel,
    PlaneStrainFrom3D,
    UniaxialStrainFrom3D,
)
from fenics_constitutive_tpu.postprocessing import qp_norm
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

E, NU = 42.0, 0.3


def left(x):
    return np.isclose(x[:, 0], 0.0)


def right(x):
    return np.isclose(x[:, 0], 1.0)


def test_uniaxial_stress():
    """reference test_elasticity.py:26-87 incl. second-load-step semantics."""
    mesh = unit_interval_mesh(10)
    V = FunctionSpace(mesh, 1, 1)
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.UNIAXIAL_STRESS)
    bc_r = DirichletBC(V.locate_dofs_geometrical(right), 0.01)
    problem = IncrSmallStrainProblem(
        law, V, [DirichletBC(V.locate_dofs_geometrical(left), 0.0), bc_r], 1
    )
    n, converged = problem.solve()
    assert converged

    analytic = E * 0.01
    diff = problem.stress_1[..., 0] - analytic
    assert float(qp_norm(diff, problem.dxm)) < 1e-10 / analytic

    problem.update()
    diff = problem.stress_0[..., 0] - analytic
    assert float(qp_norm(diff, problem.dxm)) < 1e-10 / analytic
    assert float(jnp.max(problem._u0)) == pytest.approx(0.01, abs=0)

    bc_r.value = 0.02
    n, converged = problem.solve()
    assert converged
    diff = problem.stress_1[..., 0] - E * 0.02
    assert float(qp_norm(diff, problem.dxm)) < 1e-10 / (E * 0.02)


@pytest.mark.parametrize("factor", [0.5, 2.0, 3.0, 4.0])
def test_uniaxial_stress_two_laws(factor):
    """reference test_elasticity.py:99-154: stress homogeneity + strain ratio."""
    mesh = unit_interval_mesh(2)
    V = FunctionSpace(mesh, 1, 1)
    laws = [
        (
            LinearElasticityModel({"E": E, "nu": NU}, Constraint.UNIAXIAL_STRESS),
            np.array([0], np.int32),
        ),
        (
            LinearElasticityModel(
                {"E": factor * E, "nu": NU}, Constraint.UNIAXIAL_STRESS
            ),
            np.array([1], np.int32),
        ),
    ]
    problem = IncrSmallStrainProblem(
        laws,
        V,
        [
            DirichletBC(V.locate_dofs_geometrical(left), 0.0),
            DirichletBC(V.locate_dofs_geometrical(right), 0.01),
        ],
        1,
    )
    n, converged = problem.solve()
    assert converged
    # read the increment gradients BEFORE update(): afterwards u == u_prev and
    # they are zero by construction (the reference's Function arrays go stale
    # instead of recomputing, so its post-update read sees the old values)
    g = [np.asarray(x).ravel() for x in problem._del_grad_u]
    problem.update()

    s = np.asarray(problem.stress_0).ravel()
    assert abs(s[0] - s[1]) < 1e-10 / abs(s[0])
    assert g[0][0] != 0.0
    assert abs(g[0][0] - factor * g[1][0]) < 1e-10 / abs(g[0][0])


def test_uniaxial_strain():
    """reference test_elasticity.py:157-236 incl. UniaxialStrainFrom3D equivalence."""
    mesh = unit_interval_mesh(2)
    V = FunctionSpace(mesh, 1, 1)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(left), 0.0),
        DirichletBC(V.locate_dofs_geometrical(right), 0.01),
    ]
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.UNIAXIAL_STRAIN)
    problem = IncrSmallStrainProblem(law, V, bcs, 1)
    problem.solve()
    problem.update()

    analytic = (E * (1 - NU) / ((1 + NU) * (1 - 2 * NU))) * 0.01
    diff = problem.stress_0[..., 0] - analytic
    assert float(qp_norm(diff, problem.dxm)) < 1e-10 / analytic

    law_3d = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    wrapped = UniaxialStrainFrom3D(law_3d)
    problem_3d = IncrSmallStrainProblem(wrapped, V, bcs, 1)
    problem_3d.solve()
    problem_3d.update()

    diff = problem_3d.stress_0[..., 0] - analytic
    assert float(qp_norm(diff, problem_3d.dxm)) < 1e-10 / analytic
    diff = problem_3d.stress_0 - problem.stress_0
    rel = float(qp_norm(diff, problem.dxm)) / float(
        qp_norm(problem.stress_0, problem.dxm)
    )
    assert rel < 1e-10
    # shear components of the full 3D stress are zero (reference line 233)
    s3d = np.asarray(problem_3d._history_0[0]["stress_3d"])
    assert np.linalg.norm(s3d[:, 3:6]) < 1e-14
    # displacements agree
    assert float(jnp.linalg.norm(problem_3d.u - problem.u)) < 1e-14


@pytest.mark.parametrize(("cell_type", "q_degree"), [("triangle", 1), ("quad", 2)])
def test_plane_strain(cell_type, q_degree):
    """reference test_elasticity.py:239-297: sigma_zz != 0 + wrapper equivalence."""
    mesh = unit_square_mesh(2, 2, cell_type)
    V = FunctionSpace(mesh, 1, 2)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(left), np.array([0.0, 0.0])),
        DirichletBC(V.locate_dofs_geometrical(right), np.array([0.01, 0.0])),
    ]
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.PLANE_STRAIN)
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree)
    n, converged = problem.solve()
    assert converged
    problem.update()
    assert float(qp_norm(problem.stress_0[..., 2], problem.dxm)) > 1e-2

    wrapped = PlaneStrainFrom3D(
        LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    )
    problem_3d = IncrSmallStrainProblem(wrapped, V, bcs, q_degree)
    problem_3d.solve()
    problem_3d.update()
    assert float(qp_norm(problem_3d.stress_0[..., 2], problem.dxm)) > 1e-2

    rel_u = float(jnp.linalg.norm(problem_3d.u - problem.u)) / float(
        jnp.linalg.norm(problem.u)
    )
    assert rel_u < 1e-14
    rel_s = float(
        qp_norm(problem_3d.stress_0 - problem.stress_0, problem.dxm)
    ) / float(qp_norm(problem.stress_0, problem.dxm))
    assert rel_s < 1e-10


@pytest.mark.parametrize(("cell_type", "q_degree"), [("triangle", 1), ("quad", 2)])
def test_plane_stress(cell_type, q_degree):
    """reference test_elasticity.py:300-333: sigma_zz == 0 emerges from the solve."""
    mesh = unit_square_mesh(2, 2, cell_type)
    V = FunctionSpace(mesh, 1, 2)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(left), np.array([0.0, 0.0])),
        DirichletBC(V.locate_dofs_geometrical(right), np.array([0.01, 0.0])),
    ]
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.PLANE_STRESS)
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree)
    n, converged = problem.solve()
    assert converged
    problem.update()
    assert float(qp_norm(problem.stress_0[..., 2], problem.dxm)) < 1e-10


@pytest.mark.parametrize(("cell_type", "q_degree"), [("tetra", 1), ("hex", 2)])
def test_3d_vs_direct_solve(cell_type, q_degree):
    """reference test_elasticity.py:335-402: cross-check against an independently
    assembled dense stiffness solve of the same discrete problem."""
    mesh = unit_cube_mesh(2, 2, 2, cell_type)
    V = FunctionSpace(mesh, 1, 3)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(left), np.array([0.0, 0.0, 0.0])),
        DirichletBC(V.locate_dofs_geometrical(right), np.array([0.01, 0.0, 0.0])),
    ]
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    # engine="aos": this test densifies the AoS matrix-free operator from
    # problem._tangents, which only the AoS engine materializes as [C,Q,s,s]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree, engine="aos")
    n, converged = problem.solve()
    assert converged
    problem.update()

    # independent direct solve: dense matrix from the matrix-free operator
    from fenics_constitutive_tpu.fem.assembly import tangent_matvec
    from fenics_constitutive_tpu.fem.bcs import combine_bcs

    dofmap, geo, _ = problem._law_data[0]
    tangent = problem._tangents[0]
    ndofs = problem.ndofs
    A = np.zeros((ndofs, ndofs))
    for i in range(ndofs):
        e = jnp.zeros(ndofs).at[i].set(1.0)
        A[:, i] = np.asarray(
            tangent_matvec(e, tangent, dofmap, geo, Constraint.FULL, ndofs)
        )
    bc_dofs, bc_vals = combine_bcs(bcs)
    freemask = np.ones(ndofs, bool)
    freemask[bc_dofs] = False
    u_direct = np.zeros(ndofs)
    u_direct[bc_dofs] = bc_vals
    rhs = -A[np.ix_(freemask, ~freemask)] @ bc_vals
    u_direct[freemask] = np.linalg.solve(A[np.ix_(freemask, freemask)], rhs)

    diff = np.linalg.norm(np.asarray(problem.u) - u_direct)
    assert diff < 1e-8 * np.linalg.norm(u_direct)
