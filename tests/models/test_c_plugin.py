"""The standalone C plug-in (examples/mises_c) matches the pure-JAX
MisesPlasticityLinearHardening3D through a multi-step plastic BVP — the
analog of the reference's cross-language equivalence tests
(tests/models/test_elasticity.py:335 parametrized ["python", "rust"])."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2] / "examples" / "mises_c"))

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import MisesPlasticityLinearHardening3D
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem

PARAMS = {"mu": 80769.0, "kappa": 175000.0, "y_0": 250.0, "h": 1000.0}


def _solve_path(law):
    mesh = unit_cube_mesh(2, 2, 2, "hex")
    V = FunctionSpace(mesh, 1, 3)
    move = DirichletBC(
        V.locate_dofs_geometrical(
            lambda x: np.isclose(x[:, 0], 1.0), component=0
        ),
        0.0,
    )
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
        move,
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=2)
    stresses = []
    for disp in np.linspace(0.001, 0.012, 6):
        move.value = float(disp)
        niter, converged = problem.solve()
        assert converged
        problem.update()
        stresses.append(np.asarray(problem.stress_0).copy())
    return np.stack(stresses)


@pytest.mark.skipif(
    __import__("shutil").which("gcc") is None, reason="no C compiler"
)
@pytest.mark.slow
def test_c_plugin_matches_jax_mises():
    from run_example import MisesC3D

    sig_c = _solve_path(MisesC3D(PARAMS))
    sig_jax = _solve_path(MisesPlasticityLinearHardening3D(PARAMS))
    # identical radial-return math, different languages: tight agreement
    np.testing.assert_allclose(sig_c, sig_jax, rtol=1e-6, atol=1e-6)
    # the path actually goes plastic
    assert np.abs(sig_c[-1, ..., 0]).max() > PARAMS["y_0"]
