"""Second-order (CG2) elements: the README/BASELINE '2x2x2 CG-2 uniaxial
stretch' configuration plus exactness checks.

The reference gets CG2 from basix; here P2/Q2 are tabulated in
fem/elements.py and dofs are identified by coordinate dedup (fem/spaces.py).
"""

import numpy as np
import pytest

from fenics_constitutive_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    unit_cube_mesh,
    unit_interval_mesh,
)
from fenics_constitutive_tpu.fem.elements import tabulate_element
from fenics_constitutive_tpu.models import Constraint, LinearElasticityModel
from fenics_constitutive_tpu.postprocessing import qp_norm
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

E, NU = 42.0, 0.3


@pytest.mark.parametrize(
    ("cell", "deg"),
    [("interval", 2), ("triangle", 2), ("tetra", 2), ("quad", 2), ("hex", 2)],
)
def test_partition_of_unity_and_gradients(cell, deg):
    elem, quad = tabulate_element(cell, deg, 3 if cell != "tetra" else 2)
    np.testing.assert_allclose(elem.N.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(elem.dN_dxi.sum(axis=1), 0.0, atol=1e-12)
    # nodal interpolation property: N_i(x_j) = delta_ij
    elem2, _ = tabulate_element(cell, deg, deg)
    from fenics_constitutive_tpu.fem.elements import (
        _interval_basis,
        _tensor_basis,
        _tetra_basis,
        _triangle_basis,
    )

    basis = {
        "interval": lambda p: _interval_basis(deg, p)[0],
        "triangle": lambda p: _triangle_basis(deg, p)[0],
        "tetra": lambda p: _tetra_basis(deg, p)[0],
        "quad": lambda p: _tensor_basis(deg, p, 2)[0],
        "hex": lambda p: _tensor_basis(deg, p, 3)[0],
    }[cell]
    N_at_nodes = basis(elem.nodes)
    np.testing.assert_allclose(N_at_nodes, np.eye(len(elem.nodes)), atol=1e-12)


def test_cg2_dof_count_interval():
    mesh = unit_interval_mesh(4)
    V = FunctionSpace(mesh, 2, 1)
    assert V.n_dof_nodes == 9  # 5 vertices + 4 midpoints


def test_cg2_uniaxial_stress_bar():
    mesh = unit_interval_mesh(3)
    V = FunctionSpace(mesh, 2, 1)
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.UNIAXIAL_STRESS)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)), 0.0),
        DirichletBC(V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0)), 0.01),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=2)
    n, converged = problem.solve()
    assert converged
    diff = problem.stress_1[..., 0] - E * 0.01
    assert float(qp_norm(diff, problem.dxm)) < 1e-10


@pytest.mark.parametrize(("cell_type", "q_degree"), [("tetra", 2), ("hex", 4)])
@pytest.mark.slow
def test_cg2_cube_stretch(cell_type, q_degree):
    """BASELINE config: 2x2x2 unit cube, CG-2, uniaxial stretch."""
    mesh = unit_cube_mesh(2, 2, 2, cell_type)
    V = FunctionSpace(mesh, 2, 3)
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    # fully constrained affine BCs: exact solution is homogeneous strain
    exx = 0.01
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), exx),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(1, 1.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 1.0), component=2), 0.0),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=q_degree)
    n, converged = problem.solve()
    assert converged
    problem.update()
    # uniaxial strain state: sigma_xx = (lam + 2 mu) exx, homogeneous
    mu, lam = E / (2 * (1 + NU)), E * NU / ((1 + NU) * (1 - 2 * NU))
    sxx = (lam + 2 * mu) * exx
    diff = problem.stress_0[..., 0] - sxx
    assert float(qp_norm(diff, problem.dxm)) < 1e-9
    # ux is linear in x: check a midside dof
    mid = V.locate_dofs_geometrical(
        lambda x: np.isclose(x[:, 0], 0.25)
        & np.isclose(x[:, 1], 0.0)
        & np.isclose(x[:, 2], 0.0),
        component=0,
    )
    assert len(mid) >= 1
    np.testing.assert_allclose(np.asarray(problem.u)[mid], 0.25 * exx, atol=1e-12)
