"""Drucker-Prager plasticity (classic and hyperbolically-smoothed apex).

Capability parity with the reference's Rust models exposed through pyo3
(comfe-rs/src/plasticity/drucker_prager_classic.rs:24-166 and
drucker_prager_hyperbolic.rs, bound in bindings/src/lib.rs:154-182 and wrapped
by models/rust_models.py:84-161):

  * classic yield:     f = sqrt(J2) + b * I1 - a
  * hyperbolic yield:  f = sqrt(J2 + (b d)^2 ... ) — reference uses
                       sqrt(J2 + d^2) + b * I1 - a (hyperbolic.rs:88)
  * flow: associated when b_flow == b, else the non-associated direction
    b_flow * I2 + dsqrt(J2)/dsigma (purely deviatoric radial return at
    b_flow = 0).

Both run through the generic implicit return map (plasticity_general.py) with
jacfwd-exact Newton. The classic cone tip (the reference runtime-asserts
``I1 < a/b``, classic.rs:86) cannot raise under jit: J2 -> 0 there makes the
flow direction blow up and the local Newton stop at maxit with non-finite
values — detect via ``jnp.isfinite`` on the stress, or prefer the hyperbolic
model, which is smooth at the apex.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import mandel
from ..ops.mandel import Constraint
from .interfaces import IncrSmallStrainModel, register_model
from .plasticity_general import implicit_return_map

__all__ = ["DruckerPrager3D", "DruckerPragerHyperbolic3D"]


class _DruckerPragerBase(IncrSmallStrainModel):
    _param_names: tuple[str, ...]

    def __init__(self, parameters):
        # weak-typed scalars: follow the state dtype (see as_param_dict)
        self.params = {
            k: jnp.asarray(float(np.asarray(parameters[k]).reshape(())))
            for k in self._param_names
        }
        #: local-Newton controls (reference general.rs:168-170)
        self.newton_atol = 1e-10
        self.newton_rtol = 1e-10
        self.newton_maxit = 25

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self) -> dict[str, int]:
        # named split of the reference's flat {"history": 7}
        # (bindings/src/lib.rs:130-136; general.rs:85-93)
        return {"alpha": 1, "plastic_strain": 6}

    # tangent is nonsymmetric under non-associated flow: tell the solver
    @property
    def symmetric_tangent(self) -> bool:
        return bool(self.params["b"] == self.params["b_flow"])

    def _f(self, sigma, kappa):
        raise NotImplementedError

    def _df_dj2_dir(self, sigma):
        """0.5/sqrt(J2-term) and the deviatoric direction; surface-specific."""
        raise NotImplementedError

    def _g(self, sigma, kappa):
        i2 = jnp.asarray(mandel.sym_identity(6), sigma.dtype)
        df_dj2, s = self._df_dj2_dir(sigma)
        # b_flow * I2 + dsqrt(J2)/dsigma: equals df_dsigma (associated flow)
        # exactly when b_flow == b (classic.rs:96-106)
        return self.params["b_flow"] * i2 + df_dj2 * s

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        del t, del_t
        mu, kappa_b = self.params["mu"], self.params["kappa"]
        C = mandel.isotropic_elastic_tangent(mu, kappa_b).astype(stress.dtype)
        eps = mandel.strain_from_grad_u(grad_del_u, Constraint.FULL)
        sigma_1, tangent, alpha_1, del_eps_p = implicit_return_map(
            self._f,
            self._g,
            C,
            stress,
            eps,
            history["alpha"],
            atol=self.newton_atol,
            rtol=self.newton_rtol,
            maxit=self.newton_maxit,
        )
        history_new = {
            "alpha": alpha_1,
            "plastic_strain": history["plastic_strain"] + del_eps_p,
        }
        return sigma_1, tangent, history_new


@register_model(param_fields=("params",))
class DruckerPrager3D(_DruckerPragerBase):
    """Classic cone: f = sqrt(J2) + b I1 - a (drucker_prager_classic.rs:89).

    Parameters: mu, kappa, a, b, b_flow (b_flow = b for associated flow,
    b_flow = 0 for deviatoric radial return).
    """

    _param_names = ("mu", "kappa", "a", "b", "b_flow")

    def _f(self, sigma, kappa):
        del kappa  # no hardening feedback (df_dkappa = 0 in the reference)
        i1, j2, _ = mandel.i1_j2_dev(sigma)
        j2 = jnp.maximum(j2, 1e-30)
        return jnp.sqrt(j2) + self.params["b"] * i1 - self.params["a"]

    def _df_dj2_dir(self, sigma):
        _, j2, s = mandel.i1_j2_dev(sigma)
        j2 = jnp.maximum(j2, 1e-30)
        return 0.5 / jnp.sqrt(j2), s


@register_model(param_fields=("params",))
class DruckerPragerHyperbolic3D(_DruckerPragerBase):
    """Smoothed apex: f = sqrt(J2 + d^2) + b I1 - a
    (drucker_prager_hyperbolic.rs:88). Parameters: mu, kappa, a, b, d, b_flow.
    """

    _param_names = ("mu", "kappa", "a", "b", "d", "b_flow")

    def _f(self, sigma, kappa):
        del kappa
        i1, j2, _ = mandel.i1_j2_dev(sigma)
        d = self.params["d"]
        return jnp.sqrt(j2 + d**2) + self.params["b"] * i1 - self.params["a"]

    def _df_dj2_dir(self, sigma):
        _, j2, s = mandel.i1_j2_dev(sigma)
        d = self.params["d"]
        return 0.5 / jnp.sqrt(j2 + d**2), s
