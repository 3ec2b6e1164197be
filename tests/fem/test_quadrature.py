"""Arbitrary quadrature degree on simplices (Grundmann-Möller rules).

Reference parity: basix provides any q_degree
(/root/reference/src/fenics_constitutive/solver/_spaces.py:19-47); here
tabulated rules cover degree <= 3 and the GM family covers everything above.
"""

from itertools import product
from math import factorial

import numpy as np
import pytest

from fenics_constitutive_tpu.fem.elements import gauss_rule


def _exact_monomial(powers):
    """integral of prod x_i^a_i over the unit simplex."""
    num = 1
    for a in powers:
        num *= factorial(a)
    return num / factorial(len(powers) + sum(powers))


@pytest.mark.parametrize("cell,dim", [("triangle", 2), ("tetra", 3)])
@pytest.mark.parametrize("degree", [4, 5, 6, 7, 8])
def test_simplex_rules_exact(cell, dim, degree):
    q = gauss_rule(cell, degree)
    assert np.all(q.points >= 0) and np.all(q.points.sum(axis=1) <= 1 + 1e-14)
    for powers in product(range(degree + 1), repeat=dim):
        if sum(powers) > degree:
            continue
        val = float(
            np.sum(q.weights * np.prod(q.points ** np.array(powers), axis=1))
        )
        ex = _exact_monomial(powers)
        assert abs(val - ex) < 1e-12 * max(1.0, abs(ex)), (powers, val, ex)


def test_high_q_degree_tet_bvp():
    """IncrSmallStrainProblem(law, V, bcs, q_degree=4) on a tet mesh runs and
    reproduces the uniaxial-stress solution (VERDICT r1 item #6)."""
    from fenics_constitutive_tpu.fem import (
        DirichletBC,
        FunctionSpace,
        unit_cube_mesh,
    )
    from fenics_constitutive_tpu.models import LinearElasticityModel
    from fenics_constitutive_tpu.ops.mandel import Constraint
    from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

    mesh = unit_cube_mesh(2, 2, 2, "tetra")
    V = FunctionSpace(mesh, 2, 3)  # P2 displacement, q_degree 4
    E, nu = 100.0, 0.3
    law = LinearElasticityModel({"E": E, "nu": nu}, Constraint.FULL)
    bcs = [
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 0], 0.0), component=0
            ),
            0.0,
        ),
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 1], 0.0), component=1
            ),
            0.0,
        ),
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 2], 0.0), component=2
            ),
            0.0,
        ),
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 0], 1.0), component=0
            ),
            0.01,
        ),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=4)
    niter, converged = problem.solve()
    assert converged
    problem.update()
    # lateral faces free -> homogeneous uniaxial stress: sigma_xx = E * eps
    # (the reference's test_uniaxial_stress configuration)
    np.testing.assert_allclose(
        np.asarray(problem.stress_0[..., 0]), E * 0.01, rtol=1e-8
    )
    # other stress components vanish
    np.testing.assert_allclose(
        np.asarray(problem.stress_0[..., 1:]), 0.0, atol=1e-8
    )
