"""Path-dependent plasticity BVPs: 100-step monotonic and cyclic loading.

Mirrors /root/reference/tests/models/test_plasticity.py:13-287 (same material
parameters, load program, and 1e-8/1e-7 tolerances), parametrized over the
exponential-hardening VonMises3D and the linear-hardening closed-form model —
the same pairing the reference uses (Python model vs Rust model).
"""

import numpy as np
import pytest

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import (
    MisesPlasticityLinearHardening3D,
    VonMises3D,
)
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

MAT = {
    "p_ka": 175000.0,
    "p_mu": 80769.0,
    "p_y0": 1200.0,
    "p_y00": 2500.0,
    "p_w": 200.0,
}


def make_problem(law):
    mesh = unit_cube_mesh(1, 1, 1, "tetra")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    zero = 0.0
    bc_move = DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), zero),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), zero),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), zero),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=1)
    return problem, bc_move


def elastic_slope():
    """Analytic uniaxial-strain-with-free-lateral slope used by the reference
    (test_plasticity.py:126-133)."""
    ka, mu = MAT["p_ka"], MAT["p_mu"]
    v = (3 * ka - 2 * mu) / (2 * (3 * ka + mu))
    trace = 1.0 - 2 * v
    dev = 1.0 - trace / 3
    return ka * trace + 2 * mu * dev


@pytest.mark.parametrize(
    "model_cls", [VonMises3D, MisesPlasticityLinearHardening3D]
)
def test_uniaxial_stress_3d(model_cls):
    if model_cls is VonMises3D:
        law = model_cls(MAT)
        test_max_stress = True
    else:
        law = model_cls(
            {
                "mu": MAT["p_mu"],
                "kappa": MAT["p_ka"],
                "y_0": MAT["p_y0"],
                "h": MAT["p_w"],
            }
        )
        test_max_stress = False
    problem, bc_move = make_problem(law)

    n_time, max_disp = 100, 0.05
    load_steps = np.linspace(0, 1, num=n_time + 1)[1:]
    displacement, load = [0.0], [0.0]
    for time in load_steps:
        bc_move.value = time * max_disp
        niter, converged = problem.solve()
        assert converged
        problem.update()
        displacement.append(time * max_disp)
        load.append(float(np.asarray(problem.stress_0).reshape(-1, 6)[0, 0]))

    displacement = np.array(displacement)
    load = np.array(load)
    tolerance = 1e-8

    if test_max_stress:
        assert np.max(load) - MAT["p_y00"] <= tolerance

    indices = load + tolerance < MAT["p_y0"]
    slope = elastic_slope()
    assert np.all(
        np.abs(np.ediff1d(load[indices]) / np.ediff1d(displacement[indices]) - slope)
        < 1e-7
    )


def test_uniaxial_cyclic_strain_3d():
    """reference test_plasticity.py:140-287: sinusoidal cyclic loading; the
    elastic range stretches with isotropic hardening, slope stays elastic."""
    law = VonMises3D(MAT)
    problem, bc_move = make_problem(law)

    n_time, max_disp = 100, 0.05
    load_steps = np.linspace(np.pi, -np.pi, num=n_time + 1)
    displacement, load = [0.0], [0.0]
    for time in load_steps:
        bc_move.value = float(np.sin(time) * max_disp)
        niter, converged = problem.solve()
        assert converged
        problem.update()
        displacement.append(float(bc_move.value))
        load.append(float(np.asarray(problem.stress_0).reshape(-1, 6)[0, 0]))

    displacement = np.array(displacement)
    load = np.array(load)
    tolerance = 1e-8
    assert np.max(load) - MAT["p_y00"] <= tolerance
    assert abs(np.min(load)) - MAT["p_y00"] <= tolerance

    slope = elastic_slope()

    load_1 = load[: int(n_time / 4 + 2)]
    disp_1 = displacement[: int(n_time / 4 + 2)]
    idx = np.abs(load_1) + tolerance < MAT["p_y0"]
    assert np.all(
        np.abs(np.ediff1d(load_1[idx][1:]) / np.ediff1d(disp_1[idx][1:]) - slope)
        < 1e-7
    )

    load_2 = load[int(n_time / 4 + 2) : int(3 * n_time / 4 + 1)]
    disp_2 = displacement[int(n_time / 4 + 2) : int(3 * n_time / 4 + 1)]
    idx = np.abs(load_2) + tolerance < max(np.max(load_1), MAT["p_y0"])
    assert np.all(
        np.abs(np.ediff1d(load_2[idx]) / np.ediff1d(disp_2[idx]) - slope) < 1e-7
    )

    load_3 = load[int(3 * n_time / 4 + 1) :]
    disp_3 = displacement[int(3 * n_time / 4 + 1) :]
    idx = np.abs(load_3) + tolerance < max(
        np.max(load_1), abs(np.min(load_2)), MAT["p_y0"]
    )
    assert np.all(
        np.abs(np.ediff1d(load_3[idx]) / np.ediff1d(disp_3[idx]) - slope) < 1e-7
    )
