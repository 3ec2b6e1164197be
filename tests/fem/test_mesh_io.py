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


def test_cell_sets_roundtrip(tmp_path):
    """int + named physical groups survive write_gmsh/read_gmsh."""
    from dataclasses import replace

    mesh = unit_cube_mesh(2, 2, 2, "tetra")
    mids = mesh.cell_midpoints()
    left = np.nonzero(mids[:, 0] < 0.5)[0].astype(np.int32)
    right = np.nonzero(mids[:, 0] >= 0.5)[0].astype(np.int32)
    mesh = replace(
        mesh, cell_sets={1: left, 2: right, "soft": left, "stiff": right}
    )
    path = tmp_path / "tagged.msh"
    write_gmsh(path, mesh)
    mesh2 = read_gmsh(path)
    assert set(mesh2.cell_sets) == {1, 2, "soft", "stiff"}
    np.testing.assert_array_equal(mesh2.cell_sets[1], left)
    np.testing.assert_array_equal(mesh2.cell_sets["stiff"], right)


def test_read_gmsh_v41(tmp_path):
    """ASCII v4.1 (modern Gmsh default): entity-block nodes/elements +
    physical groups via $Entities."""
    msh = """$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
2
2 10 "lower"
2 20 "upper"
$EndPhysicalNames
$Entities
0 0 2 0
1 0 0 0 1 1 0 1 10 0
2 0 0 0 1 1 0 1 20 0
$EndEntities
$Nodes
2 4 1 4
2 1 0 2
1
2
0 0 0
1 0 0
2 2 0 2
3
4
1 1 0
0 1 0
$EndNodes
$Elements
2 2 1 2
2 1 2 1
1 1 2 3
2 2 2 1
2 1 3 4
$EndElements
"""
    path = tmp_path / "v41.msh"
    path.write_text(msh)
    mesh = read_gmsh(path)
    assert mesh.cell_type == "triangle"
    assert mesh.num_nodes == 4 and mesh.num_cells == 2
    np.testing.assert_allclose(
        mesh.nodes, [[0, 0], [1, 0], [1, 1], [0, 1]], atol=0
    )
    np.testing.assert_array_equal(mesh.cells, [[0, 1, 2], [0, 2, 3]])
    assert set(mesh.cell_sets) == {10, 20, "lower", "upper"}
    np.testing.assert_array_equal(mesh.cell_sets["lower"], [0])
    np.testing.assert_array_equal(mesh.cell_sets[20], [1])


def test_two_material_bar_from_msh(tmp_path):
    """The reference's two-material bar (test_elasticity.py:90-154) built
    ENTIRELY from a .msh file: physical groups -> laws -> solve."""
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
2
1 1 "soft"
1 2 "stiff"
$EndPhysicalNames
$Nodes
3
1 0 0 0
2 0.5 0 0
3 1 0 0
$EndNodes
$Elements
2
1 1 2 1 0 1 2
2 1 2 2 0 2 3
$EndElements
"""
    path = tmp_path / "bar.msh"
    path.write_text(msh)
    mesh = read_gmsh(path)
    assert mesh.cell_type == "interval"
    factor = 3.0
    E = 42.0
    laws = [
        (
            LinearElasticityModel(
                {"E": E, "nu": 0.3}, Constraint.UNIAXIAL_STRESS
            ),
            mesh.cell_sets["soft"],
        ),
        (
            LinearElasticityModel(
                {"E": factor * E, "nu": 0.3}, Constraint.UNIAXIAL_STRESS
            ),
            mesh.cell_sets["stiff"],
        ),
    ]
    V = FunctionSpace(mesh, 1, 1)
    problem = IncrSmallStrainProblem(
        laws,
        V,
        [
            DirichletBC(
                V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)),
                0.0,
            ),
            DirichletBC(
                V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0)),
                0.01,
            ),
        ],
        1,
    )
    n, converged = problem.solve()
    assert converged
    g = [np.asarray(x).ravel() for x in problem._del_grad_u]
    problem.update()
    s = np.asarray(problem.stress_0).ravel()
    assert abs(s[0] - s[1]) < 1e-10 / abs(s[0])  # homogeneous stress
    assert g[0][0] != 0.0
    assert abs(g[0][0] - factor * g[1][0]) < 1e-10 / abs(g[0][0])


@pytest.mark.parametrize("cell_type", ["tetra", "hex", "triangle"])
def test_gmsh_binary_v41_roundtrip(tmp_path, cell_type):
    """BINARY v4.1 (gmsh's default output): nodes/cells round-trip."""
    from fenics_constitutive_tpu.fem.io import write_gmsh41_binary
    from fenics_constitutive_tpu.fem import unit_square_mesh

    if cell_type == "triangle":
        mesh = unit_square_mesh(3, 2, "triangle")
    else:
        mesh = unit_cube_mesh(2, 3, 2, cell_type)
    path = tmp_path / "bin.msh"
    write_gmsh41_binary(path, mesh)
    # sanity: the file really is binary (undecodable payload after header)
    raw = open(path, "rb").read()
    assert b"4.1 1 8" in raw
    mesh2 = read_gmsh(path)
    assert mesh2.cell_type == cell_type
    np.testing.assert_allclose(mesh2.nodes, mesh.nodes, atol=1e-14)
    np.testing.assert_array_equal(mesh2.cells, mesh.cells)


def test_gmsh_binary_v41_cell_sets(tmp_path):
    """Physical groups + $PhysicalNames survive the binary round-trip."""
    from dataclasses import replace

    from fenics_constitutive_tpu.fem.io import write_gmsh41_binary

    mesh = unit_cube_mesh(2, 2, 2, "tetra")
    mids = mesh.cell_midpoints()
    left = np.nonzero(mids[:, 0] < 0.5)[0].astype(np.int32)
    right = np.nonzero(mids[:, 0] >= 0.5)[0].astype(np.int32)
    mesh = replace(
        mesh, cell_sets={1: left, 2: right, "soft": left, "stiff": right}
    )
    path = tmp_path / "tagged_bin.msh"
    write_gmsh41_binary(path, mesh)
    mesh2 = read_gmsh(path)
    assert set(mesh2.cell_sets) == {1, 2, "soft", "stiff"}
    np.testing.assert_array_equal(mesh2.cell_sets[1], left)
    np.testing.assert_array_equal(mesh2.cell_sets["stiff"], right)
    np.testing.assert_array_equal(mesh2.cells, mesh.cells)


def test_gmsh_binary_ascii_agree(tmp_path):
    """The binary and ASCII writers produce identical meshes on read."""
    from fenics_constitutive_tpu.fem.io import write_gmsh41_binary

    mesh = unit_cube_mesh(3, 2, 2, "hex")
    pa, pb = tmp_path / "a.msh", tmp_path / "b.msh"
    write_gmsh(pa, mesh)
    write_gmsh41_binary(pb, mesh)
    ma, mb = read_gmsh(pa), read_gmsh(pb)
    np.testing.assert_allclose(ma.nodes, mb.nodes, atol=1e-14)
    np.testing.assert_array_equal(ma.cells, mb.cells)
