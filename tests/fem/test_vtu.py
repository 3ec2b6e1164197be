"""VTU/PVD field output: write a solved field, re-read it, round-trip check.

The reference writes fields through dolfinx XDMF + adios4dolfinx
(tests/solver/test_solver_mpi.py:97-109); write_vtu/read_vtu is our
visualization-output analog (ParaView-loadable).
"""

import numpy as np
import pytest

from fenics_constitutive_tpu.fem import unit_cube_mesh, unit_square_mesh
from fenics_constitutive_tpu.fem.io import PVDWriter, read_vtu, write_vtu


@pytest.mark.parametrize(
    "mesh",
    [
        unit_square_mesh(3, 2, "triangle"),
        unit_square_mesh(3, 2, "quad"),
        unit_cube_mesh(2, 2, 2, "tetra"),
        unit_cube_mesh(2, 2, 2, "hex"),
    ],
    ids=["tri", "quad", "tet", "hex"],
)
def test_vtu_roundtrip(tmp_path, mesh):
    rng = np.random.default_rng(0)
    pd = {
        "u": rng.normal(size=(mesh.num_nodes, mesh.gdim)),
        "temp": rng.normal(size=mesh.num_nodes),
    }
    cd = {"stress": rng.normal(size=(mesh.num_cells, 6))}
    path = tmp_path / "field.vtu"
    write_vtu(path, mesh, point_data=pd, cell_data=cd)

    m2, pd2, cd2 = read_vtu(path)
    assert m2.cell_type == mesh.cell_type
    np.testing.assert_allclose(m2.nodes, mesh.nodes, atol=1e-15)
    np.testing.assert_array_equal(m2.cells, mesh.cells)
    np.testing.assert_allclose(pd2["u"], pd["u"], rtol=1e-15)
    np.testing.assert_allclose(pd2["temp"], pd["temp"], rtol=1e-15)
    np.testing.assert_allclose(cd2["stress"], cd["stress"], rtol=1e-15)


def test_vtu_solved_field(tmp_path):
    """Solve a BVP and write displacement + QP-averaged stress for ParaView."""
    from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace
    from fenics_constitutive_tpu.models import LinearElasticityModel
    from fenics_constitutive_tpu.ops.mandel import Constraint
    from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

    mesh = unit_cube_mesh(2, 2, 2, "hex")
    V = FunctionSpace(mesh, 1, 3)
    law = LinearElasticityModel({"E": 100.0, "nu": 0.3}, Constraint.FULL)
    bcs = [
        DirichletBC(
            V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)), 0.0
        ),
        DirichletBC(
            V.locate_dofs_geometrical(
                lambda x: np.isclose(x[:, 0], 1.0), component=0
            ),
            0.01,
        ),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=2)
    niter, converged = problem.solve()
    assert converged
    problem.update()

    u2d = np.asarray(problem.u).reshape(-1, 3)
    sig_cell = np.asarray(problem.stress_0).mean(axis=1)  # [C, 6]
    path = tmp_path / "solved.vtu"
    write_vtu(path, mesh, point_data={"u": u2d}, cell_data={"stress": sig_cell})

    _, pd2, cd2 = read_vtu(path)
    np.testing.assert_allclose(pd2["u"], u2d, rtol=1e-14)
    np.testing.assert_allclose(cd2["stress"], sig_cell, rtol=1e-14)


def test_pvd_series(tmp_path):
    mesh = unit_square_mesh(2, 2, "quad")
    pvd = PVDWriter(tmp_path / "run.pvd")
    for k in range(3):
        pvd.write(
            mesh,
            time=0.5 * k,
            point_data={"u": np.full((mesh.num_nodes, 2), float(k))},
        )
    pvd.close()
    text = (tmp_path / "run.pvd").read_text()
    assert text.count("<DataSet") == 3
    assert 'timestep="1.0"' in text
    # the per-step files exist and hold the right data
    _, pd, _ = read_vtu(tmp_path / "run_000002.vtu")
    np.testing.assert_allclose(pd["u"], 2.0)
