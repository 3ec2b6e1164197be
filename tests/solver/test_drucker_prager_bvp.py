"""Drucker-Prager through the full incremental solver (BVP level).

The reference never exercises its Drucker-Prager models through a Python BVP
(only via cargo test); this closes that gap: a pressure-dependent bar in
tension yields earlier than in compression, the return map keeps the stress
on the cone, and the JAX and native-C++ models agree through the solve.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import DruckerPrager3D
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem
import pytest

PARAMS = {"mu": 80769.0, "kappa": 175000.0, "a": 1000.0, "b": 0.15, "b_flow": 0.15}


def solve_bar(sign, n_steps=8, max_disp=0.008):
    mesh = unit_cube_mesh(2, 2, 2, "hex")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bc_move = DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.0)
    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        bc_move,
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    law = DruckerPrager3D(PARAMS)
    problem = IncrSmallStrainProblem(law, V, bcs, 2)
    for k in range(1, n_steps + 1):
        bc_move.value = sign * max_disp * k / n_steps
        niter, converged = problem.solve()
        assert converged
        problem.update()
    return problem, law


@pytest.mark.slow
def test_tension_yields_on_cone():
    problem, law = solve_bar(+1)
    stress = jnp.asarray(np.asarray(problem.stress_0).reshape(-1, 6))
    f = np.asarray(jax.vmap(lambda s: law._f(s, None))(stress))
    # yielded QPs sit on the cone; none outside
    assert f.max() < 1e-6
    alpha = np.asarray(problem._history_0[0]["alpha"])
    assert alpha.max() > 0  # plasticity happened in tension


@pytest.mark.slow
def test_pressure_dependence():
    """Same |displacement|: tension yields (f ~ 0 active), compression stays
    further inside the cone (higher |I1| raises strength for b > 0)."""
    p_t, law = solve_bar(+1)
    p_c, _ = solve_bar(-1)
    a_t = np.asarray(p_t._history_0[0]["alpha"]).max()
    a_c = np.asarray(p_c._history_0[0]["alpha"]).max()
    assert a_t > a_c  # more plastic flow in tension


@pytest.mark.slow
def test_native_matches_jax_through_solve():
    from fenics_constitutive_tpu.native import NativeModel, ensure_built

    ensure_built()
    mesh = unit_cube_mesh(1, 1, 1, "tetra")
    V = FunctionSpace(mesh, 1, 3)

    def close(axis, v):
        return lambda x: np.isclose(x[:, axis], v)

    bcs = [
        DirichletBC(V.locate_dofs_geometrical(close(0, 0.0), component=0), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(0, 1.0), component=0), 0.008),
        DirichletBC(V.locate_dofs_geometrical(close(1, 0.0), component=1), 0.0),
        DirichletBC(V.locate_dofs_geometrical(close(2, 0.0), component=2), 0.0),
    ]
    us = []
    for law in (DruckerPrager3D(PARAMS), NativeModel("drucker_prager3d", PARAMS)):
        problem = IncrSmallStrainProblem(law, V, bcs, 1)
        n, converged = problem.solve()
        assert converged
        problem.update()
        us.append(np.asarray(problem.u))
    np.testing.assert_allclose(us[0], us[1], rtol=1e-6, atol=1e-10)
