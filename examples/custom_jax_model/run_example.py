"""Write a custom constitutive model in pure JAX — the primary plug-in path.

Where the reference's custom-model story is Rust/C++/Fortran behind a numpy
ABI (docs/custom_models/*), this framework's first-class path is a pure
function: anything that maps (t, dt, grad_del_u, stress, history) to
(stress, tangent, history) with jnp ops jits, vmaps, differentiates, and
shards for free. This example implements a Ramberg-Osgood-flavored nonlinear
elastic model not present in the library and uses it end-to-end.

Run:  python examples/custom_jax_model/run_example.py
"""

from __future__ import annotations

# allow running from a plain checkout: put the repo root on sys.path when
# the package is not installed (the reference's examples are instead built
# against an installed fenics_constitutive; we stay dependency-free)
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.fem import DirichletBC, FunctionSpace, unit_cube_mesh
from fenics_constitutive_tpu.models import Constraint
from fenics_constitutive_tpu.models.interfaces import (
    IncrSmallStrainModel,
    register_model,
)
from fenics_constitutive_tpu.ops import mandel
from fenics_constitutive_tpu.solver import IncrSmallStrainProblem


@register_model(param_fields=("params",))
class NonlinearElastic3D(IncrSmallStrainModel):
    """Deviatorically-stiffening elasticity: mu_eff = mu (1 + c ||e'||).

    The tangent comes from jax.jacfwd of the stress function — no hand
    derivation, and it is exactly consistent by construction.
    """

    def __init__(self, parameters: dict[str, float]):
        self.params = {
            k: jnp.asarray(float(v)) for k, v in parameters.items()
        }  # mu, kappa, c

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self):
        return {"strain": 6}  # total strain (path-independent model)

    def _stress_of_strain(self, eps_total):
        mu, kappa, c = self.params["mu"], self.params["kappa"], self.params["c"]
        tr = eps_total[:3].sum()
        i2 = jnp.asarray(mandel.sym_identity(6), eps_total.dtype)
        dev = eps_total - tr / 3.0 * i2
        # smooth norm: plain jnp.linalg.norm has a NaN derivative at 0, which
        # would poison the jacfwd-computed tangent on the first iteration
        dev_norm = jnp.sqrt(jnp.sum(dev * dev) + 1e-30)
        mu_eff = mu * (1.0 + c * dev_norm)
        return kappa * tr * i2 + 2.0 * mu_eff * dev

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        del t, del_t
        deps = mandel.strain_from_grad_u(grad_del_u, Constraint.FULL)
        eps_total = history["strain"] + deps

        sigma_fn = self._stress_of_strain
        stress_new = jax.vmap(sigma_fn)(eps_total)
        tangent = jax.vmap(jax.jacfwd(sigma_fn))(eps_total)
        return stress_new, tangent, {"strain": eps_total}


def main():
    mesh = unit_cube_mesh(2, 2, 2, "hex")
    V = FunctionSpace(mesh, 1, 3)
    law = NonlinearElastic3D({"mu": 80.0, "kappa": 170.0, "c": 50.0})
    bcs = [
        DirichletBC(
            V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 0.0)),
            np.zeros(3),
        ),
        DirichletBC(
            V.locate_dofs_geometrical(lambda x: np.isclose(x[:, 0], 1.0)),
            np.array([0.05, 0.0, 0.0]),
        ),
    ]
    problem = IncrSmallStrainProblem(law, V, bcs, 2)
    n, converged = problem.solve()
    problem.update()
    print(f"converged={converged} in {n} Newton iterations (nonlinear model)")
    print("mean sigma_xx =", float(problem.stress_0[..., 0].mean()))


if __name__ == "__main__":
    # demo scale is tiny — run on CPU in f64 (TPU scale-up goes through
    # PackedSimulation; see docs/performance.md)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    main()
