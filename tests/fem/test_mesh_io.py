"""Gmsh I/O round-trip + solve on an imported unstructured mesh."""

import numpy as np
import pytest

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.fem.io import read_gmsh, write_gmsh
from fenics_constitutive_tpu.models import Constraint, LinearElasticityModel
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem


@pytest.mark.parametrize("cell_type", ["tetra", "hex"])
def test_gmsh_roundtrip(tmp_path, cell_type):
    mesh = unit_cube_mesh(2, 2, 2, cell_type)
    path = tmp_path / "m.msh"
    write_gmsh(path, mesh)
    mesh2 = read_gmsh(path)
    assert mesh2.cell_type == cell_type
    np.testing.assert_allclose(mesh2.nodes, mesh.nodes, atol=1e-12)
    np.testing.assert_array_equal(mesh2.cells, mesh.cells)


def test_solve_on_imported_mesh(tmp_path):
    mesh = unit_cube_mesh(2, 2, 2, "tetra")
    path = tmp_path / "m.msh"
    write_gmsh(path, mesh)
    mesh2 = read_gmsh(path)  # loses structured metadata: general path

    V = FunctionSpace(mesh2, 1, 3)
    bcs = [
        DirichletBC(
            V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)),
            np.zeros(3),
        ),
        DirichletBC(
            V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0)),
            np.array([0.01, 0.0, 0.0]),
        ),
    ]
    problem = IncrSmallStrainProblem(
        LinearElasticityModel({"E": 42.0, "nu": 0.3}, Constraint.FULL), V, bcs, 1
    )
    n, converged = problem.solve()
    assert converged
