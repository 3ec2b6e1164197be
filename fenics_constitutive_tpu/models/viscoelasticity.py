"""Standard-linear-solid viscoelasticity: spring-Kelvin and spring-Maxwell forms.

Capability parity with the reference
(/root/reference/src/fenics_constitutive/models/spring_kelvin_model.py:9-99 and
spring_maxwell_model.py:8-99): deviatoric 3D generalization of the 1D
three-parameter models, backward-Euler update of the viscous strain, history
``{"strain_visco": s, "strain": s}``. Fully vectorized over the QP batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import mandel
from ..ops.mandel import Constraint
from .interfaces import Array, IncrSmallStrainModel, register_model


def _elastic_tangent_traced(E, nu, constraint: Constraint, dtype) -> Array:
    """get_elastic_tangent with traced (jnp scalar) parameters."""
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    if constraint in (Constraint.FULL, Constraint.PLANE_STRAIN):
        s = constraint.stress_strain_dim
        pdev = jnp.asarray(mandel.projection_dev(6)[:s, :s], dtype)
        ones = jnp.asarray(3.0 * mandel.projection_vol(6)[:s, :s], dtype)
        return 2.0 * mu * pdev + (lam + 2.0 * mu / 3.0) * ones
    if constraint == Constraint.PLANE_STRESS:
        fac = E / (1.0 - nu**2)
        z = jnp.zeros_like(fac)
        return jnp.stack(
            [
                jnp.stack([fac, fac * nu, z, z]),
                jnp.stack([fac * nu, fac, z, z]),
                jnp.stack([z, z, z, z]),
                jnp.stack([z, z, z, fac * (1.0 - nu)]),
            ]
        ).astype(dtype)
    if constraint == Constraint.UNIAXIAL_STRAIN:
        return (E * (1.0 - nu) / ((1.0 + nu) * (1.0 - 2.0 * nu)))[None, None].astype(
            dtype
        )
    return E[None, None].astype(dtype)  # UNIAXIAL_STRESS


class _SLSBase(IncrSmallStrainModel):
    """Shared plumbing for the two three-parameter models."""

    def __init__(self, parameters: dict[str, float], constraint: Constraint):
        self._constraint = constraint
        nu = 0.0 if constraint == Constraint.UNIAXIAL_STRESS else float(parameters["nu"])
        # weak-typed scalars: follow the state dtype (see as_param_dict)
        self.params = {
            "E0": jnp.asarray(float(parameters["E0"])),
            "E1": jnp.asarray(float(parameters["E1"])),
            "tau": jnp.asarray(float(parameters["tau"])),
            "nu": jnp.asarray(nu),
        }

    @property
    def constraint(self) -> Constraint:
        return self._constraint

    @property
    def history_dim(self) -> dict[str, int]:
        s = self.stress_strain_dim
        return {"strain_visco": s, "strain": s}


@register_model(param_fields=("params",))
class SpringKelvinModel(_SLSBase):
    """Spring in series with a Kelvin body (spring_kelvin_model.py:9-99).

    ::

                              |--- E_1: spring ---|
          --- E_0: spring  ---|                   |--
                              |--- eta: damper ---|
    """

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        del t
        c = self._constraint
        dtype = stress.dtype
        E0, E1, tau, nu = (
            self.params["E0"],
            self.params["E1"],
            self.params["tau"],
            self.params["nu"],
        )
        mu0 = E0 / (2.0 * (1.0 + nu))
        lam0 = E0 * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
        mu1 = E1 / (2.0 * (1.0 + nu))
        D0 = _elastic_tangent_traced(E0, nu, c, dtype)

        eps = mandel.strain_from_grad_u(grad_del_u, c)
        strain_visco_n = history["strain_visco"]
        strain_n = history["strain"]
        I2 = jnp.asarray(mandel.get_identity(c), dtype)
        # trace over the geometric diagonal only (reference kelvin:69-71 uses
        # the first geometric_dim slots).
        tr_eps = jnp.sum(eps[:, : c.geometric_dim], axis=1, keepdims=True)

        factor = 1.0 / del_t + 1.0 / tau + mu0 / (tau * mu1)
        deps_visko = (
            1.0
            / factor
            * (
                1.0 / (tau * 2.0 * mu1) * stress
                - 1.0 / tau * strain_visco_n
                + mu0 / (tau * mu1) * eps
                + lam0 / (tau * 2.0 * mu1) * tr_eps * I2
            )
        )
        stress_new = stress + eps @ D0.T - 2.0 * mu0 * deps_visko
        D = (1.0 - mu0 / (tau * mu1 * factor)) * D0
        tangent = jnp.broadcast_to(D, (eps.shape[0], *D.shape))
        history_new = {
            "strain_visco": strain_visco_n + deps_visko,
            "strain": strain_n + eps,
        }
        return stress_new, tangent, history_new


@register_model(param_fields=("params",))
class SpringMaxwellModel(_SLSBase):
    """Spring in parallel with a Maxwell branch (spring_maxwell_model.py:8-99).

    ::

            |----------- E_0: spring  ----------|
          --|                                   |--
            |--- E_1: spring --- eta: damper ---|
    """

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        del t
        c = self._constraint
        dtype = stress.dtype
        E0, E1, tau, nu = (
            self.params["E0"],
            self.params["E1"],
            self.params["tau"],
            self.params["nu"],
        )
        mu1 = E1 / (2.0 * (1.0 + nu))
        D0 = _elastic_tangent_traced(E0, nu, c, dtype)
        D1 = _elastic_tangent_traced(E1, nu, c, dtype)

        eps = mandel.strain_from_grad_u(grad_del_u, c)
        strain_visco_n = history["strain_visco"]
        strain_n = history["strain"]

        strain_total = strain_n + eps
        factor = 1.0 / del_t + 1.0 / tau
        deps_visko = (
            1.0
            / factor
            * (
                1.0 / (tau * 2.0 * mu1) * (strain_total @ D1.T)
                - 1.0 / tau * strain_visco_n
            )
        )
        dstress = eps @ (D0 + D1).T - 2.0 * mu1 * deps_visko
        stress_new = stress + dstress
        D = D0 + (1.0 - 1.0 / (tau * factor)) * D1
        tangent = jnp.broadcast_to(D, (eps.shape[0], *D.shape))
        history_new = {
            "strain_visco": strain_visco_n + deps_visko,
            "strain": strain_n + eps,
        }
        return stress_new, tangent, history_new
