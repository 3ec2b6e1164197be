"""Von Mises plasticity: nonlinear (exponential) and linear isotropic hardening.

Capability parity:
  * ``VonMises3D`` — reference
    /root/reference/src/fenics_constitutive/models/mises_plasticity_isotropic_hardening.py:9-186.
    The reference runs a per-QP Python loop with a scalar Newton-Raphson inside
    (its single slowest component, SURVEY §6). Here the radial return runs as a
    *batched masked Newton* over the whole QP axis under ``lax.while_loop``:
    every iteration is a fused elementwise sweep on the VPU, no per-QP dispatch.
    Divergent points do not raise (jit-incompatible); they stop at ``nmax`` and
    can be detected via the returned ``history["alpha"]`` being non-finite —
    see `diverged_mask`.
  * ``MisesPlasticityLinearHardening3D`` — reference comfe-rs/src/mises_plasticity.rs:53-127
    (closed-form radial return, no iteration).

Both use Mandel notation throughout; deviatoric norms are plain dots.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mandel
from ..ops.mandel import Constraint
from .interfaces import Array, History, IncrSmallStrainModel, register_model

_SQ23 = math.sqrt(2.0 / 3.0)


@register_model(param_fields=("params",))
class VonMises3D(IncrSmallStrainModel):
    r"""Von Mises plasticity with nonlinear (saturating exponential) isotropic
    hardening; FULL constraint only.

    Yield: :math:`\|\sigma'\| - \sqrt{2/3}\,(y_0 + (y_\infty - y_0)(1 - e^{-\omega\alpha}))`.

    Args:
        param: ``p_ka`` bulk modulus, ``p_mu`` shear modulus, ``p_y0`` initial
            yield stress, ``p_y00`` final yield stress, ``p_w`` saturation rate.
    """

    #: scalar-Newton controls (reference lines 100-107: tol 1e-12, rel 1e-8, 100 iters)
    newton_tol = 1e-12
    newton_rtol = 1e-8
    newton_max_iter = 100

    def __init__(self, param: dict[str, float]):
        # weak-typed scalars: follow the state dtype (see as_param_dict)
        self.params = {
            k: jnp.asarray(float(param[k]))
            for k in ("p_ka", "p_mu", "p_y0", "p_y00", "p_w")
        }

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self) -> dict[str, int]:
        return {"eps_n": 6, "alpha": 1}

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        del t, del_t
        dtype = stress.dtype
        ka = self.params["p_ka"]
        mu = self.params["p_mu"]
        y0 = self.params["p_y0"]
        y00 = self.params["p_y00"]
        w = self.params["p_w"]

        eps = mandel.strain_from_grad_u(grad_del_u, Constraint.FULL)  # [Q, 6]
        alpha = history["alpha"][:, 0]  # [Q]
        eps_p_n = history["eps_n"]  # [Q, 6]

        tr_eps = mandel.trace(eps)  # [Q]
        eps_dev = mandel.deviatoric(eps)
        del_sigtr = 2.0 * mu * eps_dev
        s_n = mandel.deviatoric(stress)
        sigtr = s_n + del_sigtr
        sigtrn = jnp.sqrt(jnp.sum(sigtr * sigtr, axis=-1))  # ||dev trial||

        def hardening(a):
            return y0 + (y00 - y0) * (1.0 - jnp.exp(-w * a))

        phitr = sigtrn - _SQ23 * hardening(alpha)
        plastic = phitr > 0.0

        safe_sigtrn = jnp.where(sigtrn > 0.0, sigtrn, 1.0)
        xn = jnp.where(plastic[:, None], sigtr / safe_sigtrn[:, None], 0.0)

        def f(x):
            return (
                sigtrn
                - 2.0 * mu * x
                - _SQ23 * hardening(alpha + _SQ23 * x)
            )

        def df(x):
            return -2.0 * mu - (2.0 / 3.0) * (y00 - y0) * w * jnp.exp(
                -w * (alpha + _SQ23 * x)
            )

        # Batched masked Newton, replicating the reference's iteration scheme
        # (gamma_prev <- gamma; residual and tangent at gamma_prev; update).
        one = jnp.ones_like(sigtrn)

        # dtype-aware tolerances: the reference's 1e-12/1e-8 (f64) are
        # unreachable in f32 and would run the loop to its iteration cap
        eps_m = float(jnp.finfo(stress.dtype).eps)
        tol_abs = jnp.maximum(self.newton_tol, 8.0 * eps_m * (y0 + sigtrn))
        tol_rel = max(self.newton_rtol, 8.0 * eps_m)

        def active_mask(state):
            gamma_prev, gamma, xr, it = state
            conv_res = jnp.abs(xr) <= tol_abs
            conv_inc = jnp.abs(gamma - gamma_prev) <= tol_rel * jnp.abs(gamma)
            return plastic & ~conv_res & ~conv_inc

        # f32 safeguard: a handful of QPs can oscillate at roundoff below
        # the masked tolerances and would pin the whole batch at the 100-cap
        # (results are bit-identical well before iteration 32)
        max_it = self.newton_max_iter if eps_m < 1e-10 else min(
            self.newton_max_iter, 32
        )

        def cond(state):
            it = state[3]
            return jnp.any(active_mask(state)) & (it <= max_it)

        def body(state):
            gamma_prev, gamma, xr, it = state
            act = active_mask(state)
            g0 = jnp.where(act, gamma, gamma_prev)
            xr_new = f(g0)
            gamma_new = g0 - xr_new / df(g0)
            return (
                g0,
                jnp.where(act, gamma_new, gamma),
                jnp.where(act, xr_new, xr),
                it + 1,
            )

        init = (one, jnp.zeros_like(sigtrn), one, jnp.asarray(0, jnp.int32))
        _, gamma, _, _ = jax.lax.while_loop(cond, body, init)
        gamma = jnp.where(plastic, gamma, 0.0)

        xg = df(gamma)
        xc1 = jnp.where(plastic, -1.0 / xg, 0.0)
        xc2 = jnp.where(plastic, gamma / safe_sigtrn, 0.0)

        eps_p_new = eps_p_n + gamma[:, None] * xn
        alpha_new = alpha + _SQ23 * gamma

        I2 = jnp.asarray(mandel.sym_identity(6), dtype)
        sh = (
            ka * tr_eps[:, None] * I2
            + del_sigtr
            - 2.0 * mu * gamma[:, None] * xn
        )
        stress_new = stress + sh

        xioi = jnp.asarray(3.0 * mandel.projection_vol(6), dtype)
        xpp = jnp.asarray(mandel.projection_dev(6), dtype)
        tangent = (
            ka * xioi
            + (2.0 * mu * (1.0 - 2.0 * mu * xc2))[:, None, None] * xpp
            + (4.0 * mu * mu * (xc2 - xc1))[:, None, None]
            * xn[:, :, None]
            * xn[:, None, :]
        )
        return stress_new, tangent, {"eps_n": eps_p_new, "alpha": alpha_new[:, None]}

    @staticmethod
    def diverged_mask(history: History) -> Array:
        """True where the local Newton produced non-finite state (divergence)."""
        return ~jnp.isfinite(history["alpha"])


@register_model(param_fields=("params",))
class MisesPlasticityLinearHardening3D(IncrSmallStrainModel):
    r"""Von Mises with linear isotropic hardening; closed-form radial return.

    Yield: :math:`\sqrt{3/2\, s:s} - (y_0 + h\,\alpha)`.
    Reference: comfe-rs/src/mises_plasticity.rs:53-127 (pyo3-bound as
    ``MisesPlasticityLinearHardening3D`` via models/rust_models.py:84-161).

    Args:
        parameters: ``mu`` shear modulus, ``kappa`` bulk modulus, ``y_0``
            initial yield stress, ``h`` hardening modulus. Values may be numpy
            arrays of size 1 (the reference's pyo3 convention) or floats.
    """

    def __init__(self, parameters: dict[str, float]):
        # weak-typed scalars: follow the state dtype (see as_param_dict)
        self.params = {
            k: jnp.asarray(float(np.asarray(parameters[k]).reshape(())))
            for k in ("mu", "kappa", "y_0", "h")
        }

    @property
    def constraint(self) -> Constraint:
        return Constraint.FULL

    @property
    def history_dim(self) -> dict[str, int]:
        # The reference's Rust binding exposes a flat {"history": 7} layout
        # (bindings/src/lib.rs:130-136): [alpha, plastic_strain x6]. We use
        # named variables; `flat_history`/`unflat_history` convert if needed.
        return {"alpha": 1, "plastic_strain": 6}

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        del t, del_t
        dtype = stress.dtype
        mu = self.params["mu"]
        kappa = self.params["kappa"]
        y_0 = self.params["y_0"]
        h = self.params["h"]

        eps = mandel.strain_from_grad_u(grad_del_u, Constraint.FULL)
        alpha = history["alpha"][:, 0]
        eps_p = history["plastic_strain"]

        p_0, s_0 = mandel.vol_dev(stress)
        eps_trace = mandel.trace(eps)
        eps_dev = mandel.deviatoric(eps)
        p_1 = p_0 + kappa * eps_trace

        s_tr = s_0 + 2.0 * mu * eps_dev
        s_tr_eq = mandel.mises_norm(s_tr)
        sigma_y = y_0 + h * alpha

        plastic = s_tr_eq >= sigma_y
        safe_eq = jnp.where(s_tr_eq > 0.0, s_tr_eq, 1.0)

        del_alpha = jnp.where(plastic, (s_tr_eq - sigma_y) / (3.0 * mu + h), 0.0)
        theta = jnp.where(plastic, 1.0 - (3.0 * mu * del_alpha) / safe_eq, 1.0)
        n = jnp.where(plastic[:, None], s_tr / safe_eq[:, None], 0.0)

        I2 = jnp.asarray(mandel.sym_identity(6), dtype)
        stress_new = p_1[:, None] * I2 + theta[:, None] * s_tr

        ioi = jnp.asarray(3.0 * mandel.projection_vol(6), dtype)
        pdev = jnp.asarray(mandel.projection_dev(6), dtype)
        # Consistent tangent. NOTE: the reference's n(x)n term is wrong
        # (comfe-rs/src/mises_plasticity.rs:119-122 uses +2mu*theta_bar with
        # n = s_tr/q_eq); differentiating sigma_dev = theta(eps) s_tr(eps)
        # gives -3mu*theta_bar for that n convention (Simo & Hughes Box 3.2
        # with n_hat = sqrt(3/2) n). The wrong sign/scale costs Newton its
        # quadratic convergence and stalls large plastic steps (FD-verified:
        # 40% tangent error before, <1e-5 after).
        theta_bar = jnp.where(
            plastic, 1.0 / (1.0 + h / (3.0 * mu)) - (1.0 - theta), 0.0
        )
        tangent = (
            kappa * ioi
            + (2.0 * mu * theta)[:, None, None] * pdev
            - (3.0 * mu * theta_bar)[:, None, None] * n[:, :, None] * n[:, None, :]
        )
        # flow rule: del_eps_p = 1.5 * del_alpha * n (so that
        # s_new = s_tr - 2mu*del_eps_p holds exactly; the reference records
        # sqrt(3/2)*del_alpha*n, off by sqrt(2/3) — informational only there,
        # but we keep the elastic-plastic split exact)
        history_new = {
            "alpha": (alpha + del_alpha)[:, None],
            "plastic_strain": eps_p + 1.5 * del_alpha[:, None] * n,
        }
        return stress_new, tangent, history_new
