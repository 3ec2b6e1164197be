"""Linear elasticity for all five stress-strain constraints.

Capability parity with the reference LinearElasticityModel
(/root/reference/src/fenics_constitutive/models/linear_elasticity_model.py:9-56):
``stress += D @ strain_increment``, tangent = D, no history. Here the update is a
single batched matmul over the QP axis (MXU-friendly) instead of numpy tiling.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import mandel
from ..ops.mandel import Constraint
from .interfaces import Array, History, IncrSmallStrainModel, register_model


@register_model(param_fields=("params",))
class LinearElasticityModel(IncrSmallStrainModel):
    """Hooke's law per constraint.

    Args:
        parameters: must contain "E" (Young's modulus) and "nu" (Poisson ratio).
        constraint: the stress-strain constraint.
    """

    def __init__(self, parameters: dict[str, float], constraint: Constraint):
        self._constraint = constraint
        E = float(parameters["E"])
        nu = float(parameters["nu"])
        # The tangent is a function of (E, nu); store the parameters as leaves and
        # build D at trace time so a jitted step follows parameter updates.
        # weak-typed scalars: follow the state dtype (see as_param_dict)
        self.params = {
            "E": jnp.asarray(E),
            "nu": jnp.asarray(nu),
        }

    def _tangent(self, dtype) -> Array:
        E, nu = self.params["E"], self.params["nu"]
        c = self._constraint
        mu = E / (2.0 * (1.0 + nu))
        lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
        if c == Constraint.FULL or c == Constraint.PLANE_STRAIN:
            s = c.stress_strain_dim
            pdev = jnp.asarray(mandel.projection_dev(6)[:s, :s], dtype)
            pvol = jnp.asarray(mandel.projection_vol(6)[:s, :s] * 3.0, dtype)
            # 2 mu P_dev + (lam + 2/3 mu) * (I2 x I2); identical to utils.py:42-61.
            return 2.0 * mu * pdev + (lam + 2.0 * mu / 3.0) * pvol
        if c == Constraint.UNIAXIAL_STRAIN:
            return jnp.asarray([[1.0]], dtype) * (
                E * (1.0 - nu) / ((1.0 + nu) * (1.0 - 2.0 * nu))
            )
        # UNIAXIAL_STRESS
        return jnp.asarray([[1.0]], dtype) * E

    def tangent_matrix(self, dtype=None) -> Array:
        """The constraint-specific elastic tangent D (Mandel)."""
        dtype = dtype or jnp.result_type(float)
        c = self._constraint
        E, nu = self.params["E"], self.params["nu"]
        if c == Constraint.PLANE_STRESS:
            fac = E / (1.0 - nu**2)
            row0 = jnp.stack([fac, fac * nu, jnp.zeros_like(fac), jnp.zeros_like(fac)])
            row1 = jnp.stack([fac * nu, fac, jnp.zeros_like(fac), jnp.zeros_like(fac)])
            row2 = jnp.zeros(4, dtype)
            row3 = jnp.stack(
                [
                    jnp.zeros_like(fac),
                    jnp.zeros_like(fac),
                    jnp.zeros_like(fac),
                    fac * (1.0 - nu),
                ]
            )
            return jnp.stack([row0, row1, row2, row3]).astype(dtype)
        return self._tangent(dtype)

    def evaluate(
        self,
        t,
        del_t,
        grad_del_u: Array,
        stress: Array,
        history: History,
    ) -> tuple[Array, Array, History]:
        del t, del_t
        eps = mandel.strain_from_grad_u(grad_del_u, self._constraint)
        D = self.tangent_matrix(eps.dtype)
        stress_new = stress + eps @ D.T  # D symmetric; .T keeps row-vector convention
        tangent = jnp.broadcast_to(D, (eps.shape[0], *D.shape))
        return stress_new, tangent, history

    @property
    def constraint(self) -> Constraint:
        return self._constraint

    @property
    def history_dim(self) -> None:
        return None
