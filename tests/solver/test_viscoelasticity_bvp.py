"""Time-dependent viscoelastic BVPs: relaxation, Kelvin-Maxwell equivalence,
stress-controlled creep, and 2D/3D consistency.

Mirrors /root/reference/tests/models/test_viscoelasticity.py (same parameters:
E0=42, E1=10, tau=10, nu=0.2; tiny first step dt=1e-8 for the elastic instant
response; 1e-8 tolerances; creep via a Neumann traction).
"""

import numpy as np
import pytest

from fenics_constitutive_tpu.fem import (
    DirichletBC,
    FunctionSpace,
    unit_cube_mesh,
    unit_interval_mesh,
    unit_square_mesh,
)
from fenics_constitutive_tpu.fem.facets import (
    assemble_facet_traction,
    locate_boundary_facets,
)
from fenics_constitutive_tpu.models import (
    Constraint,
    SpringKelvinModel,
    SpringMaxwellModel,
)
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

E0, NU = 42.0, 0.2
E1 = 10.0
TAU = 10.0


def x_is(v):
    return lambda x: np.isclose(x[:, 0], v)


def axis_is(axis, v):
    return lambda x: np.isclose(x[:, axis], v)


@pytest.mark.parametrize("mat", [SpringKelvinModel, SpringMaxwellModel])
def test_relaxation_uniaxial_stress(mat):
    """reference test_viscoelasticity.py:27-127 (1D displacement-controlled)."""
    mesh = unit_interval_mesh(2)
    V = FunctionSpace(mesh, 1, 1)
    law = mat({"E0": E0, "E1": E1, "tau": TAU}, Constraint.UNIAXIAL_STRESS)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(x_is(0.0)), 0.0),
        DirichletBC(V.locate_dofs_geometrical(x_is(1.0)), 0.01),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, 1, del_t=2.0)

    stress, strain, viscostrain = [], [], []

    problem._del_t = 1e-8  # elastic instant response
    problem.solve()
    problem.update()
    stress.append(float(np.asarray(problem.stress_1).ravel()[-1]))
    strain.append(float(np.asarray(problem._history_1[0]["strain"]).ravel()[-1]))
    viscostrain.append(
        float(np.asarray(problem._history_1[0]["strain_visco"]).ravel()[-1])
    )

    problem._del_t = 2.0
    while problem._time < 20 * TAU:
        n, converged = problem.solve()
        assert converged
        problem.update()
        stress.append(float(np.asarray(problem.stress_1).ravel()[-1]))
        strain.append(float(np.asarray(problem._history_1[0]["strain"]).ravel()[-1]))
        viscostrain.append(
            float(np.asarray(problem._history_1[0]["strain_visco"]).ravel()[-1])
        )

    if mat is SpringKelvinModel:
        stress_0_ana = E0 * 0.01
        stress_final_ana = E0 * E1 / (E0 + E1) * 0.01
    else:
        stress_0_ana = (E0 + E1) * 0.01
        stress_final_ana = E0 * 0.01

    assert abs(stress[0] - stress_0_ana) < 1e-8
    assert abs(stress[-1] - stress_final_ana) < 1e-8
    assert abs(strain[0] - 0.01) < 1e-8
    assert np.sum(np.diff(strain)) < 1e-8
    assert abs(viscostrain[0]) < 1e-8
    assert viscostrain[-1] > 0


def _uniaxial_bvp(dim, mat, constraint):
    """Symmetric-boundary uniaxial tension setup (reference lines 131-215)."""
    if dim == 2:
        mesh = unit_square_mesh(2, 2, "triangle")
    else:
        mesh = unit_cube_mesh(2, 2, 2, "tetra")
    V = FunctionSpace(mesh, 1, dim)
    law = mat({"E0": E0, "E1": E1, "tau": TAU, "nu": NU}, constraint)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(axis_is(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(axis_is(1, 0.0), component=1), 0.0),
    ]
    if dim == 3:
        bcs.append(
            DirichletBC(V.locate_dofs_geometrical(axis_is(2, 0.0), component=2), 0.0)
        )
    return mesh, V, law, bcs


@pytest.mark.parametrize("mat", [SpringKelvinModel, SpringMaxwellModel])
@pytest.mark.parametrize("dim", [2, 3])
def test_relaxation(dim, mat):
    """reference test_viscoelasticity.py:131-288 (2D plane stress / 3D full)."""
    constraint = Constraint.PLANE_STRESS if dim == 2 else Constraint.FULL
    mesh, V, law, bcs = _uniaxial_bvp(dim, mat, constraint)
    bcs.append(
        DirichletBC(V.locate_dofs_geometrical(axis_is(0, 1.0), component=0), 0.01)
    )
    problem = IncrSmallStrainProblem(law, V, bcs, 1, del_t=2.0)

    stress, strain, viscostrain = [], [], []

    def observe():
        stress.append(float(np.asarray(problem.stress_1).max()))
        strain.append(float(np.asarray(problem._history_1[0]["strain"]).max()))
        viscostrain.append(
            float(np.asarray(problem._history_1[0]["strain_visco"]).max())
        )

    problem._del_t = 1e-8
    problem.solve()
    problem.update()
    observe()

    problem._del_t = 2.0
    while problem._time < 20 * TAU:
        n, converged = problem.solve()
        assert converged
        problem.update()
        observe()

    if mat is SpringKelvinModel:
        stress_0_ana = E0 * 0.01
        stress_final_ana = E0 * E1 / (E0 + E1) * 0.01
    else:
        stress_0_ana = (E0 + E1) * 0.01
        stress_final_ana = E0 * 0.01

    assert abs(stress[0] - stress_0_ana) < 1e-8
    assert abs(stress[-1] - stress_final_ana) < 1e-8
    assert abs(strain[0] - 0.01) < 1e-8
    assert np.sum(np.diff(strain)) < 1e-8
    assert abs(viscostrain[0]) < 1e-8
    assert viscostrain[-1] > 0


def test_kelvin_vs_maxwell():
    """reference test_viscoelasticity.py:291-366: parameter-equivalent models
    produce the same stress history."""
    mesh = unit_interval_mesh(2)
    V = FunctionSpace(mesh, 1, 1)
    law_K = SpringKelvinModel(
        {"E0": E0, "E1": E1, "tau": TAU, "nu": NU}, Constraint.UNIAXIAL_STRESS
    )
    E0_M = (E0 * E1) / (E0 + E1)
    E1_M = E0**2 / (E0 + E1)
    tau_M = E1 / (E0 + E1) * TAU
    law_M = SpringMaxwellModel(
        {"E0": E0_M, "E1": E1_M, "tau": tau_M, "nu": NU}, Constraint.UNIAXIAL_STRESS
    )
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(x_is(0.0)), 0.0),
        DirichletBC(V.locate_dofs_geometrical(x_is(1.0)), 0.001),
    ]
    dt = 0.1
    stress_p = []
    for law in (law_K, law_M):
        problem = IncrSmallStrainProblem(law, V, bcs, 4, del_t=dt)
        stress = []
        while problem._time < 10 * dt:
            n, converged = problem.solve()
            assert converged
            problem.update()
            stress.append(float(np.asarray(problem.stress_1).ravel()[-1]))
        stress_p.append(stress)
    assert np.linalg.norm(np.array(stress_p[0]) - np.array(stress_p[1])) < 1e-8


@pytest.mark.parametrize("mat", [SpringKelvinModel, SpringMaxwellModel])
@pytest.mark.parametrize("dim", [2, 3])
def test_creep(dim, mat):
    """reference test_viscoelasticity.py:369-527: stress-controlled creep via a
    Neumann traction assembled into f_ext."""
    f_max = 0.1
    constraint = Constraint.PLANE_STRESS if dim == 2 else Constraint.FULL
    mesh, V, law, bcs = _uniaxial_bvp(dim, mat, constraint)

    load = np.zeros(dim)
    load[0] = f_max
    facets = locate_boundary_facets(mesh, x_is(1.0))
    f_ext = assemble_facet_traction(V, facets, load)

    problem = IncrSmallStrainProblem(law, V, bcs, 1, del_t=2.0)
    problem.f_ext = problem.f_ext + f_ext

    stress, strain, viscostrain = [], [], []

    def observe():
        stress.append(float(np.asarray(problem.stress_1).max()))
        strain.append(float(np.asarray(problem._history_1[0]["strain"]).max()))
        viscostrain.append(
            float(np.asarray(problem._history_1[0]["strain_visco"]).max())
        )

    problem._del_t = 1e-8
    problem.solve()
    problem.update()
    observe()

    problem._del_t = 2.0
    while problem._time < 20 * TAU:
        n, converged = problem.solve()
        assert converged
        problem.update()
        observe()

    if mat is SpringKelvinModel:
        strain_0_ana = f_max / E0
        strain_final_ana = f_max / E0 + f_max / E1
    else:
        strain_0_ana = f_max / (E0 + E1)
        strain_final_ana = f_max / E0

    assert abs(strain[0] - strain_0_ana) < 1e-8
    assert abs(strain[-1] - strain_final_ana) < 1e-8
    assert abs(stress[0] - f_max) < 1e-8
    assert np.sum(np.diff(stress)) < 1e-8
    assert abs(viscostrain[0]) < 1e-8
    assert viscostrain[-1] > 0


@pytest.mark.parametrize("mat", [SpringKelvinModel, SpringMaxwellModel])
def test_plane_strain_matches_3d_fixed_z(mat):
    """2D plane strain == 3D with u_z = 0 everywhere, per load step
    (reference test_viscoelasticity.py:664-694): same relaxation history,
    stress components agree at every step."""
    disp = 0.01

    # 2D plane-strain problem
    mesh2 = unit_square_mesh(2, 2, "triangle")
    V2 = FunctionSpace(mesh2, 1, 2)
    bm2 = DirichletBC(V2.locate_dofs_geometrical(axis_is(0, 1.0), component=0), 0.0)
    bcs2 = [
        DirichletBC(V2.locate_dofs_geometrical(axis_is(0, 0.0), component=0), 0.0),
        bm2,
        DirichletBC(V2.locate_dofs_geometrical(axis_is(1, 0.0), component=1), 0.0),
    ]
    law2 = mat({"E0": E0, "E1": E1, "tau": TAU, "nu": NU}, Constraint.PLANE_STRAIN)
    p2 = IncrSmallStrainProblem(law2, V2, bcs2, 1, del_t=1e-8)

    # 3D problem with u_z pinned at EVERY node (eps_zz == 0 by constraint)
    mesh3 = unit_cube_mesh(2, 2, 2, "tetra")
    V3 = FunctionSpace(mesh3, 1, 3)
    everywhere = lambda x: np.ones(len(x), bool)  # noqa: E731
    bm3 = DirichletBC(V3.locate_dofs_geometrical(axis_is(0, 1.0), component=0), 0.0)
    bcs3 = [
        DirichletBC(V3.locate_dofs_geometrical(axis_is(0, 0.0), component=0), 0.0),
        bm3,
        DirichletBC(V3.locate_dofs_geometrical(axis_is(1, 0.0), component=1), 0.0),
        DirichletBC(V3.locate_dofs_geometrical(everywhere, component=2), 0.0),
    ]
    law3 = mat({"E0": E0, "E1": E1, "tau": TAU, "nu": NU}, Constraint.FULL)
    p3 = IncrSmallStrainProblem(law3, V3, bcs3, 1, del_t=1e-8)

    # PLANE_STRAIN Mandel order (xx, yy, zz, xy*sqrt2) -> FULL indices
    comp3 = {0: 0, 1: 1, 2: 2}

    def step(p, bm, dt):
        p._del_t = dt
        bm.value = disp
        niter, converged = p.solve()
        assert converged
        p.update()

    for k, dt in enumerate([1e-8] + [2.0] * 10):
        step(p2, bm2, dt)
        step(p3, bm3, dt)
        s2 = np.asarray(p2.stress_0).reshape(-1, 4)
        s3 = np.asarray(p3.stress_0).reshape(-1, 6)
        # homogeneous fields: compare the (constant) component values
        for i2, i3 in comp3.items():
            v2 = s2[:, i2]
            v3 = s3[:, i3]
            np.testing.assert_allclose(v2, v2[0], rtol=0, atol=1e-8)
            np.testing.assert_allclose(v3, v3[0], rtol=0, atol=1e-8)
            assert abs(v2[0] - v3[0]) < 1e-8, (k, i2, v2[0], v3[0])
    # the constraint did real work: sigma_zz is nonzero under plane strain
    assert abs(s2[0, 2]) > 1e-3
