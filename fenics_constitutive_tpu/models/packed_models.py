"""Packed (SoA) constitutive kernels for the hot models.

These are the TPU-layout twins of the reference-parity models in this package:
same math, component-axis-leading arrays ([s, N] stress, [h, N] history), and
factored isotropic tangents (ops.packed.IsotropicTangent) so the CG matvec
never touches a dense [6, 6, N] field. Numerical equivalence with the AoS
kernels is pinned by tests/solver/test_packed.py.

Contract: ``evaluate_packed(t, dt, eps [s,N], stress [s,N], history) ->
(stress', TangentRep, history')`` where ``eps`` is the Mandel strain increment
(the engine computes strain from the gradient; isotropic small-strain models
never need the rotation part).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.packed import IsotropicTangent
from .linear_elasticity import LinearElasticityModel
from .mises import MisesPlasticityLinearHardening3D, VonMises3D

_SQ23 = math.sqrt(2.0 / 3.0)


def _dev_soa(x):
    tr = x[:3].sum(axis=0)
    i2 = jnp.concatenate(
        [jnp.ones((3,) + tr.shape, x.dtype), jnp.zeros((3,) + tr.shape, x.dtype)]
    )
    return tr, x - (tr / 3.0) * i2, i2


def _vonmises_evaluate_packed(self, t, dt, eps, stress, history):
    del t, dt
    ka = self.params["p_ka"]
    mu = self.params["p_mu"]
    y0 = self.params["p_y0"]
    y00 = self.params["p_y00"]
    w = self.params["p_w"]

    alpha = history["alpha"][0]  # [N]
    eps_p_n = history["eps_n"]  # [6, N]

    tr_eps, eps_dev, i2 = _dev_soa(eps)
    del_sigtr = 2.0 * mu * eps_dev
    _, s_n, _ = _dev_soa(stress)
    sigtr = s_n + del_sigtr
    sigtrn = jnp.sqrt((sigtr * sigtr).sum(axis=0))

    def hardening(a):
        return y0 + (y00 - y0) * (1.0 - jnp.exp(-w * a))

    phitr = sigtrn - _SQ23 * hardening(alpha)
    plastic = phitr > 0.0
    safe = jnp.where(sigtrn > 0.0, sigtrn, 1.0)
    xn = jnp.where(plastic, sigtr / safe, 0.0)

    def fdf(x):
        # f and f' share the one exp evaluation (the loop's only
        # transcendental — the inner Newton is bandwidth/VPU-bound)
        e = jnp.exp(-w * (alpha + _SQ23 * x))
        fx = sigtrn - 2.0 * mu * x - _SQ23 * (y0 + (y00 - y0) * (1.0 - e))
        dfx = -2.0 * mu - (2.0 / 3.0) * (y00 - y0) * w * e
        return fx, dfx

    def df(x):
        return fdf(x)[1]

    one = jnp.ones_like(sigtrn)

    # dtype-aware tolerances (see models/mises.py note)
    eps_m = float(jnp.finfo(stress.dtype).eps)
    tol_abs = jnp.maximum(self.newton_tol, 8.0 * eps_m * (y0 + sigtrn))
    tol_rel = max(self.newton_rtol, 8.0 * eps_m)

    # f32 safeguard (see models/mises.py): don't let roundoff-oscillating QPs
    # pin the batch at the 100-iteration cap
    max_it = self.newton_max_iter if eps_m < 1e-10 else min(self.newton_max_iter, 32)

    # the active mask is CARRIED in the loop state (computed once per
    # iteration instead of twice — lax.while_loop evaluates cond AND body):
    # act_{k+1} = act_k & not-converged(g_{k+1}, g_k, xr_{k+1}); convergence
    # is monotone (inactive lanes keep stale values and stay inactive), so
    # this matches recomputing the criterion from the carried triple.
    act0 = plastic & (1.0 > tol_abs)  # == criterion on the (1, 0, 1) init

    def cond(state):
        g_prev, g, xr, it, act = state
        return jnp.any(act) & (it <= max_it)

    def body(state):
        g_prev, g, xr, it, act = state
        g0 = jnp.where(act, g, g_prev)
        xr_new, dfv = fdf(g0)
        g_new = g0 - xr_new / dfv
        g_out = jnp.where(act, g_new, g)
        xr_out = jnp.where(act, xr_new, xr)
        act_new = (
            act
            & (jnp.abs(xr_out) > tol_abs)
            & (jnp.abs(g_out - g0) > tol_rel * jnp.abs(g_out))
        )
        return (g0, g_out, xr_out, it + 1, act_new)

    _, gamma, _, _, _ = jax.lax.while_loop(
        cond, body,
        (one, jnp.zeros_like(sigtrn), one, jnp.asarray(0, jnp.int32), act0),
    )
    gamma = jnp.where(plastic, gamma, 0.0)

    xg = df(gamma)
    xc1 = jnp.where(plastic, -1.0 / xg, 0.0)
    xc2 = jnp.where(plastic, gamma / safe, 0.0)

    stress_new = stress + ka * tr_eps * i2 + del_sigtr - 2.0 * mu * gamma * xn
    history_new = {
        "eps_n": eps_p_n + gamma * xn,
        "alpha": (alpha + _SQ23 * gamma)[None],
    }
    tangent = IsotropicTangent(
        kappa=ka,
        beta=2.0 * mu * (1.0 - 2.0 * mu * xc2),
        gamma=4.0 * mu * mu * (xc2 - xc1),
        n=xn,
    )
    return stress_new, tangent, history_new


def _mises_linear_evaluate_packed(self, t, dt, eps, stress, history):
    del t, dt
    mu = self.params["mu"]
    kappa = self.params["kappa"]
    y_0 = self.params["y_0"]
    h = self.params["h"]

    alpha = history["alpha"][0]
    eps_p = history["plastic_strain"]

    tr_s, s_0, i2 = _dev_soa(stress)
    tr_e, e_dev, _ = _dev_soa(eps)
    p_1 = tr_s / 3.0 + kappa * tr_e

    s_tr = s_0 + 2.0 * mu * e_dev
    s_tr_eq = jnp.sqrt(1.5 * (s_tr * s_tr).sum(axis=0))
    sigma_y = y_0 + h * alpha
    plastic = s_tr_eq >= sigma_y
    safe = jnp.where(s_tr_eq > 0.0, s_tr_eq, 1.0)

    del_alpha = jnp.where(plastic, (s_tr_eq - sigma_y) / (3.0 * mu + h), 0.0)
    theta = jnp.where(plastic, 1.0 - (3.0 * mu * del_alpha) / safe, 1.0)
    n = jnp.where(plastic, s_tr / safe, 0.0)
    theta_bar = jnp.where(plastic, 1.0 / (1.0 + h / (3.0 * mu)) - (1.0 - theta), 0.0)

    stress_new = p_1 * i2 + theta * s_tr
    # flow-rule-exact plastic strain + corrected tangent (see models/mises.py
    # note: the reference's +2mu*theta_bar n(x)n is wrong; -3mu*theta_bar for
    # n = s_tr/q_eq restores quadratic Newton convergence)
    history_new = {
        "alpha": (alpha + del_alpha)[None],
        "plastic_strain": eps_p + 1.5 * del_alpha * n,
    }
    tangent = IsotropicTangent(
        kappa=kappa, beta=2.0 * mu * theta, gamma=-3.0 * mu * theta_bar, n=n
    )
    return stress_new, tangent, history_new


def _linear_elasticity_evaluate_packed(self, t, dt, eps, stress, history):
    from ..ops.mandel import Constraint
    from .interfaces import IncrSmallStrainModel

    if self._constraint != Constraint.FULL:
        # non-FULL constraints run through the generic dense-tangent adapter
        return IncrSmallStrainModel.evaluate_packed(
            self, t, dt, eps, stress, history
        )
    E, nu = self.params["E"], self.params["nu"]
    mu = E / (2.0 * (1.0 + nu))
    ka = E / (3.0 * (1.0 - 2.0 * nu))
    tr_e, e_dev, i2 = _dev_soa(eps)
    stress_new = stress + ka * tr_e * i2 + 2.0 * mu * e_dev
    zero = jnp.zeros_like(tr_e)
    tangent = IsotropicTangent(
        kappa=ka, beta=2.0 * mu * jnp.ones_like(tr_e), gamma=zero,
        n=jnp.zeros_like(eps),
    )
    return stress_new, tangent, history


def _sls_packed_common(self):
    """(mu0, lam0, ka0, mu1, ka1) for a FULL-constraint SLS kernel."""
    E0, E1, nu = self.params["E0"], self.params["E1"], self.params["nu"]
    mu0 = E0 / (2.0 * (1.0 + nu))
    lam0 = E0 * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    ka0 = lam0 + 2.0 * mu0 / 3.0
    mu1 = E1 / (2.0 * (1.0 + nu))
    lam1 = E1 * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    ka1 = lam1 + 2.0 * mu1 / 3.0
    return mu0, lam0, ka0, mu1, ka1


def _spring_kelvin_evaluate_packed(self, t, dt, eps, stress, history):
    """SoA twin of SpringKelvinModel.evaluate (viscoelasticity.py) with a
    FACTORED tangent: the SLS tangent is scale * D0, i.e. isotropic with
    kappa = scale*ka0, beta = scale*2mu0 — 2 scalars instead of a [6, 6, N]
    dense field on the CG hot path."""
    from ..ops.mandel import Constraint
    from .interfaces import IncrSmallStrainModel

    if self._constraint != Constraint.FULL:
        return IncrSmallStrainModel.evaluate_packed(
            self, t, dt, eps, stress, history
        )
    del t
    tau = self.params["tau"]
    mu0, lam0, ka0, mu1, _ = _sls_packed_common(self)
    sv_n = history["strain_visco"]
    strain_n = history["strain"]
    tr_eps, e_dev, i2 = _dev_soa(eps)

    factor = 1.0 / dt + 1.0 / tau + mu0 / (tau * mu1)
    deps_v = (1.0 / factor) * (
        stress / (2.0 * tau * mu1)
        - sv_n / tau
        + (mu0 / (tau * mu1)) * eps
        + (lam0 / (2.0 * tau * mu1)) * tr_eps * i2
    )
    stress_new = stress + ka0 * tr_eps * i2 + 2.0 * mu0 * e_dev - 2.0 * mu0 * deps_v
    scale = 1.0 - mu0 / (tau * mu1 * factor)
    tangent = IsotropicTangent(
        kappa=scale * ka0,
        beta=scale * 2.0 * mu0,
        gamma=jnp.zeros((), eps.dtype),
        n=jnp.zeros((6,) + (1,) * (eps.ndim - 1), eps.dtype),
    )
    history_new = {"strain_visco": sv_n + deps_v, "strain": strain_n + eps}
    return stress_new, tangent, history_new


def _spring_maxwell_evaluate_packed(self, t, dt, eps, stress, history):
    """SoA twin of SpringMaxwellModel.evaluate with a factored tangent
    (kappa = ka0 + f*ka1, beta = 2mu0 + f*2mu1)."""
    from ..ops.mandel import Constraint
    from .interfaces import IncrSmallStrainModel

    if self._constraint != Constraint.FULL:
        return IncrSmallStrainModel.evaluate_packed(
            self, t, dt, eps, stress, history
        )
    del t
    tau = self.params["tau"]
    mu0, _, ka0, mu1, ka1 = _sls_packed_common(self)
    sv_n = history["strain_visco"]
    strain_n = history["strain"]

    strain_total = strain_n + eps
    tr_st, st_dev, i2 = _dev_soa(strain_total)
    factor = 1.0 / dt + 1.0 / tau
    # D1 : strain_total in factored form
    d1_st = ka1 * tr_st * i2 + 2.0 * mu1 * st_dev
    deps_v = (1.0 / factor) * (d1_st / (2.0 * tau * mu1) - sv_n / tau)

    tr_eps, e_dev, _ = _dev_soa(eps)
    stress_new = (
        stress
        + (ka0 + ka1) * tr_eps * i2
        + 2.0 * (mu0 + mu1) * e_dev
        - 2.0 * mu1 * deps_v
    )
    f = 1.0 - 1.0 / (tau * factor)
    tangent = IsotropicTangent(
        kappa=ka0 + f * ka1,
        beta=2.0 * mu0 + f * 2.0 * mu1,
        gamma=jnp.zeros((), eps.dtype),
        n=jnp.zeros((6,) + (1,) * (eps.ndim - 1), eps.dtype),
    )
    history_new = {"strain_visco": sv_n + deps_v, "strain": strain_n + eps}
    return stress_new, tangent, history_new


VonMises3D.evaluate_packed = _vonmises_evaluate_packed
MisesPlasticityLinearHardening3D.evaluate_packed = _mises_linear_evaluate_packed
LinearElasticityModel.evaluate_packed = _linear_elasticity_evaluate_packed

from .viscoelasticity import SpringKelvinModel, SpringMaxwellModel  # noqa: E402

SpringKelvinModel.evaluate_packed = _spring_kelvin_evaluate_packed
SpringMaxwellModel.evaluate_packed = _spring_maxwell_evaluate_packed
