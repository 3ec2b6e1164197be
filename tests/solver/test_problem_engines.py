"""One solver, two engines (VERDICT r1 #4): the interactive
IncrSmallStrainProblem runs the packed/structured production engines by
default and matches the reference-parity AoS engine to near round-off.
"""

import numpy as np
import pytest

from fenics_constitutive_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    unit_cube_mesh,
)
from fenics_constitutive_tpu.models import (
    LinearElasticityModel,
    VonMises3D,
)
from fenics_constitutive_tpu.ops.mandel import Constraint
from fenics_constitutive_tpu.ops.structured import StructuredGeometry
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

MAT = {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}


def _setup(cell_type="hex", n=3):
    mesh = unit_cube_mesh(n, n, n, cell_type)
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bc_move = DirichletBC(
        V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0
    )
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    return mesh, V, bcs, bc_move


def _run(problem, bc_move, n_steps=4):
    out = []
    for k in range(1, n_steps + 1):
        bc_move.value = 0.01 * k
        niter, converged = problem.solve()
        assert converged, k
        problem.update()
        out.append(
            (np.asarray(problem.u).copy(), np.asarray(problem.stress_0).copy())
        )
    return out


def test_hex_interactive_uses_structured_engine():
    """A box-mesh interactive problem auto-selects the structured fast path."""
    _, V, bcs, _ = _setup("hex")
    problem = IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, q_degree=2)
    assert problem.engine == "packed"
    assert isinstance(problem._pk_geos[0], StructuredGeometry)


@pytest.mark.parametrize("cell_type", ["hex", "tetra"])
@pytest.mark.slow
def test_packed_engine_matches_aos_plasticity(cell_type):
    """Multi-step plastic solves agree between engines to near round-off."""
    _, V, bcs, bc_move = _setup(cell_type)
    p_pk = IncrSmallStrainProblem(VonMises3D(MAT), V, bcs, 2)
    res_pk = _run(p_pk, bc_move)
    _, V2, bcs2, bc_move2 = _setup(cell_type)
    p_aos = IncrSmallStrainProblem(VonMises3D(MAT), V2, bcs2, 2, engine="aos")
    res_aos = _run(p_aos, bc_move2)
    for (u1, s1), (u2, s2) in zip(res_pk, res_aos):
        np.testing.assert_allclose(u1, u2, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(s1, s2, rtol=1e-8, atol=1e-7)
    # histories agree through the observation surface
    a1 = np.asarray(p_pk._history_0[0]["alpha"])
    a2 = np.asarray(p_aos._history_0[0]["alpha"])
    assert a1.max() > 0  # plasticity happened
    np.testing.assert_allclose(np.sort(a1.ravel()), np.sort(a2.ravel()),
                               rtol=1e-7, atol=1e-12)


@pytest.mark.slow
def test_packed_engine_multimaterial():
    """Two laws on cell subsets run the packed engine and match AoS."""
    mesh, V, bcs, bc_move = _setup("hex")
    soft = LinearElasticityModel({"E": 50000.0, "nu": 0.3}, Constraint.FULL)
    hard = LinearElasticityModel({"E": 200000.0, "nu": 0.3}, Constraint.FULL)
    mid = mesh.cell_midpoints()
    cells_l = np.flatnonzero(mid[:, 0] < 0.5).astype(np.int32)
    cells_r = np.flatnonzero(mid[:, 0] >= 0.5).astype(np.int32)
    laws = [(soft, cells_l), (hard, cells_r)]

    p_pk = IncrSmallStrainProblem(laws, V, bcs, 2)
    assert p_pk.engine == "packed"
    res_pk = _run(p_pk, bc_move, n_steps=2)

    mesh2, V2, bcs2, bc_move2 = _setup("hex")
    p_aos = IncrSmallStrainProblem(laws, V2, bcs2, 2, engine="aos")
    res_aos = _run(p_aos, bc_move2, n_steps=2)

    for (u1, s1), (u2, s2) in zip(res_pk, res_aos):
        np.testing.assert_allclose(u1, u2, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(s1, s2, rtol=1e-8, atol=1e-7)


def test_del_grad_u_observation_matches():
    """The _del_grad_u observation surface agrees between engines."""
    _, V, bcs, bc_move = _setup("hex", n=2)
    law = LinearElasticityModel({"E": 100.0, "nu": 0.3}, Constraint.FULL)
    p_pk = IncrSmallStrainProblem(law, V, bcs, 2)
    p_aos = IncrSmallStrainProblem(law, V, bcs, 2, engine="aos")
    bc_move.value = 0.01
    p_pk.solve()
    p_aos.solve()
    g1 = np.asarray(p_pk._del_grad_u[0])
    g2 = np.asarray(p_aos._del_grad_u[0])
    assert g1.shape == g2.shape
    np.testing.assert_allclose(g1, g2, rtol=1e-9, atol=1e-13)


def test_multimaterial_box_mesh_stays_on_structured_fast_path():
    """Laws on cell subsets of a box mesh must NOT fall off the conv fast
    path: each law gets a masked structured-geometry view
    (ops.structured.restrict_structured_geometry) instead of the
    serialized-gather engine (~3 orders slower per QP on TPU)."""
    mesh, V, bcs, bc_move = _setup("hex")
    soft = LinearElasticityModel({"E": 50000.0, "nu": 0.3}, Constraint.FULL)
    hard = LinearElasticityModel({"E": 200000.0, "nu": 0.3}, Constraint.FULL)
    mid = mesh.cell_midpoints()
    cells_l = np.flatnonzero(mid[:, 0] < 0.5).astype(np.int32)
    cells_r = np.flatnonzero(mid[:, 0] >= 0.5).astype(np.int32)
    p = IncrSmallStrainProblem([(soft, cells_l), (hard, cells_r)], V, bcs, 2)
    for geo, cells in zip(p._pk_geos, (cells_l, cells_r)):
        assert hasattr(geo, "matvec_gm"), "fell off the structured fast path"
        assert geo.n_cells == len(cells)
        # the mask owns exactly this law's cell origins
        assert int(np.asarray(geo.mask).sum()) == len(cells)
    # the two masks partition the valid origins
    m = np.asarray(p._pk_geos[0].mask) + np.asarray(p._pk_geos[1].mask)
    assert m.max() == 1.0 and int(m.sum()) == mesh.num_cells
