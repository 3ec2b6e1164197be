"""Matrix-valued history variables: ``history_dim`` entries may be
``(rows, cols)`` tuples, matching the reference contract
(/root/reference/src/fenics_constitutive/models/interfaces.py:134-144
``dict[str, int | tuple[int, int]] | None``).

A model carrying the accumulated strain as a full [3, 3] tensor history
round-trips through both the interactive AoS solver and the packed
production driver.
"""

import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models.interfaces import (
    IncrSmallStrainModel,
    register_model,
)
from fenics_constitutive_tpu.ops import mandel as mandel_ops
from fenics_constitutive_tpu.ops.mandel import Constraint
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem
from fenics_constitutive_tpu.solver.simulation import PackedSimulation


@register_model
class ElasticityWithStrainTensor(IncrSmallStrainModel):
    """Linear elasticity that accumulates the symmetric strain tensor as a
    matrix-valued [3, 3] history entry (plus a scalar step counter)."""

    def __init__(self, parameters):
        self.params = {
            k: jnp.asarray(v, jnp.result_type(float))
            for k, v in parameters.items()
        }

    @property
    def constraint(self):
        return Constraint.FULL

    @property
    def history_dim(self):
        return {"eps_total": (3, 3), "steps": 1}

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        E, nu = self.params["E"], self.params["nu"]
        mu = E / (2.0 * (1.0 + nu))
        kappa = E / (3.0 * (1.0 - 2.0 * nu))
        D = mandel_ops.isotropic_elastic_tangent(mu, kappa, 6)
        eps_m = mandel_ops.strain_from_grad_u(grad_del_u, Constraint.FULL)
        s_new = stress + eps_m @ D.T
        tg = jnp.broadcast_to(D, (stress.shape[0], 6, 6))
        eps_inc = 0.5 * (grad_del_u + jnp.swapaxes(grad_del_u, -1, -2))
        h_new = {
            "eps_total": history["eps_total"] + eps_inc,
            "steps": history["steps"] + 1.0,
        }
        return s_new, tg, h_new


def _problem_setup():
    mesh = unit_cube_mesh(2, 2, 2, "hex")
    V = FunctionSpace(mesh, 1, 3)
    move = DirichletBC(
        V.locate_dofs_geometrical(
            lambda x: np.isclose(x[:, 0], 1.0), component=0
        ),
        0.01,
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
    return mesh, V, bcs, move


def test_init_history_shapes():
    law = ElasticityWithStrainTensor({"E": 100.0, "nu": 0.3})
    h = law.init_history(17)
    assert h["eps_total"].shape == (17, 3, 3)
    assert h["steps"].shape == (17, 1)


def test_matrix_history_interactive_solve():
    _, V, bcs, move = _problem_setup()
    law = ElasticityWithStrainTensor({"E": 100.0, "nu": 0.3})
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=2)

    for step, disp in enumerate([0.01, 0.02], start=1):
        move.value = disp
        niter, converged = problem.solve()
        assert converged
        problem.update()
        h = problem._history_0[0]
        assert h["eps_total"].shape[-2:] == (3, 3)
        # the accumulated eps_xx at every QP equals the applied strain
        np.testing.assert_allclose(
            np.asarray(h["eps_total"][:, 0, 0]), disp, rtol=1e-8
        )
        np.testing.assert_allclose(np.asarray(h["steps"]), step, rtol=0)
        # the tensor history stays symmetric
        np.testing.assert_allclose(
            np.asarray(h["eps_total"]),
            np.asarray(jnp.swapaxes(h["eps_total"], -1, -2)),
            atol=1e-14,
        )


def test_matrix_history_packed_production_path():
    """The generic evaluate_packed adapter reshapes matrix history correctly."""
    _, V, bcs, move = _problem_setup()
    law = ElasticityWithStrainTensor({"E": 100.0, "nu": 0.3})
    sim = PackedSimulation(law, V, bcs, q_degree=2)

    move.value = 0.01
    niter, converged = sim.solve()
    assert converged
    h = sim.histories[0]
    # packed storage is flattened [9, *qp]
    assert h["eps_total"].shape[0] == 9

    # extract real cells (the structured engine pads its footprint)
    geo = sim._geos[0]
    h_pk = h["eps_total"]
    if hasattr(geo, "extract_cells"):
        h_pk = geo.extract_cells(h_pk)  # [9, Q, C]
    h_pk = np.asarray(h_pk).reshape(9, -1)

    # compare against the interactive path
    problem = IncrSmallStrainProblem(law, V, bcs, q_degree=2)
    problem.solve()
    problem.update()
    h_aos = np.asarray(problem._history_0[0]["eps_total"])  # [N, 3, 3]
    # every QP has the same strain state in this homogeneous problem
    np.testing.assert_allclose(
        h_pk.mean(axis=1),
        h_aos.reshape(-1, 9).mean(axis=0),
        rtol=1e-8,
        atol=1e-12,
    )
