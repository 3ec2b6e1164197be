"""Model-level unit tests (no FEM solve): stress updates, tangents, history.

These exercise the constitutive layer directly on QP batches — the analog of the
reference's Rust inline unit tests (comfe-rs/src) plus consistency checks between
model pairs the reference only validates through full BVP solves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.models import (
    Constraint,
    LinearElasticityModel,
    MisesPlasticityLinearHardening3D,
    PlaneStrainFrom3D,
    SpringKelvinModel,
    SpringMaxwellModel,
    UniaxialStrainFrom3D,
    VonMises3D,
)
from fenics_constitutive_tpu.ops import mandel

E, NU = 42.0, 0.3


def rand_grad(q, g, seed=0, scale=1e-3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(q, g, g)) * scale)


@pytest.mark.parametrize("constraint", list(Constraint))
def test_linear_elasticity_matches_tangent(constraint):
    law = LinearElasticityModel({"E": E, "nu": NU}, constraint)
    g, s = constraint.geometric_dim, constraint.stress_strain_dim
    grad = rand_grad(9, g)
    stress0 = jnp.zeros((9, s))
    stress, tangent, hist = law.evaluate(0.0, 1.0, grad, stress0, None)
    assert hist is None
    D_ref = mandel.get_elastic_tangent(E, NU, constraint)
    np.testing.assert_allclose(np.asarray(tangent[0]), D_ref, rtol=1e-13)
    eps = mandel.strain_from_grad_u(grad, constraint)
    np.testing.assert_allclose(
        np.asarray(stress), np.asarray(eps) @ D_ref.T, rtol=1e-12, atol=1e-15
    )
    # tangent symmetric
    np.testing.assert_allclose(
        np.asarray(tangent), np.transpose(np.asarray(tangent), (0, 2, 1)), atol=1e-13
    )
    # incremental: evaluating again accumulates
    stress2, _, _ = law.evaluate(0.0, 1.0, grad, stress, None)
    np.testing.assert_allclose(np.asarray(stress2), 2 * np.asarray(stress), rtol=1e-12)


def test_linear_elasticity_jit_vmap_grad():
    """The model protocol must be jit/grad-clean (BASELINE north star)."""
    law = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    grad = rand_grad(4, 3)
    stress0 = jnp.zeros((4, 6))

    @jax.jit
    def energy(law_, g):
        s, _, _ = law_.evaluate(0.0, 1.0, g, stress0, None)
        return jnp.sum(s**2)

    val = energy(law, grad)
    assert jnp.isfinite(val)
    grads = jax.grad(lambda g: energy(law, g))(grad)
    assert grads.shape == grad.shape
    # parameters are pytree leaves: differentiable w.r.t. E
    dE = jax.grad(lambda l, g: energy(l, g))(law, grad)
    assert jnp.isfinite(dE.params["E"])


def make_uniaxial_strain_grad(exx, q=3):
    return jnp.zeros((q, 3, 3)).at[:, 0, 0].set(exx)


def test_vonmises_elastic_range_matches_isotropic_tangent():
    param = dict(p_ka=175000.0, p_mu=80769.0, p_y0=1200.0, p_y00=2500.0, p_w=200.0)
    law = VonMises3D(param)
    hist = law.init_history(3)
    grad = make_uniaxial_strain_grad(1e-6)
    stress, tangent, hist1 = law.evaluate(0.0, 1.0, grad, jnp.zeros((3, 6)), hist)
    D = np.asarray(
        mandel.isotropic_elastic_tangent(param["p_mu"], param["p_ka"])
    )
    np.testing.assert_allclose(np.asarray(tangent[0]), D, rtol=1e-12)
    eps = mandel.strain_from_grad_u(grad, Constraint.FULL)
    np.testing.assert_allclose(
        np.asarray(stress), np.asarray(eps) @ D.T, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(hist1["alpha"]), 0.0, atol=0)


def test_vonmises_plastic_step_on_yield_surface():
    """After a plastic step the stress must sit on the updated yield surface."""
    param = dict(p_ka=175000.0, p_mu=80769.0, p_y0=1200.0, p_y00=2500.0, p_w=200.0)
    law = VonMises3D(param)
    hist = law.init_history(2)
    grad = make_uniaxial_strain_grad(0.05, q=2)  # far past yield
    stress, tangent, hist1 = law.evaluate(0.0, 1.0, grad, jnp.zeros((2, 6)), hist)
    alpha = np.asarray(hist1["alpha"]).ravel()
    assert np.all(alpha > 0)
    dev_norm = np.linalg.norm(np.asarray(mandel.deviatoric(stress)), axis=1)
    y = param["p_y0"] + (param["p_y00"] - param["p_y0"]) * (
        1 - np.exp(-param["p_w"] * alpha)
    )
    np.testing.assert_allclose(dev_norm, np.sqrt(2 / 3) * y, rtol=1e-9)
    # consistent tangent is symmetric
    np.testing.assert_allclose(
        np.asarray(tangent), np.transpose(np.asarray(tangent), (0, 2, 1)), atol=1e-8
    )


def test_vonmises_mixed_batch_elastic_and_plastic():
    """Masked Newton: elastic and plastic QPs coexist in one batch."""
    param = dict(p_ka=175000.0, p_mu=80769.0, p_y0=1200.0, p_y00=2500.0, p_w=200.0)
    law = VonMises3D(param)
    hist = law.init_history(2)
    grad = jnp.zeros((2, 3, 3)).at[0, 0, 0].set(1e-6).at[1, 0, 0].set(0.05)
    stress, _, hist1 = law.evaluate(0.0, 1.0, grad, jnp.zeros((2, 6)), hist)
    alpha = np.asarray(hist1["alpha"]).ravel()
    assert alpha[0] == 0.0 and alpha[1] > 0.0
    # elastic QP got the pure elastic update
    D = np.asarray(mandel.isotropic_elastic_tangent(param["p_mu"], param["p_ka"]))
    eps0 = np.asarray(mandel.strain_from_grad_u(grad[0:1], Constraint.FULL))
    np.testing.assert_allclose(np.asarray(stress[0]), (eps0 @ D.T)[0], rtol=1e-10)


def test_vonmises_jittable():
    param = dict(p_ka=175000.0, p_mu=80769.0, p_y0=1200.0, p_y00=2500.0, p_w=200.0)
    law = VonMises3D(param)
    hist = law.init_history(4)
    grad = make_uniaxial_strain_grad(0.01, q=4)

    @jax.jit
    def step(law_, g, s, h):
        return law_.evaluate(0.0, 1.0, g, s, h)

    s1, t1, h1 = step(law, grad, jnp.zeros((4, 6)), hist)
    s2, t2, h2 = law.evaluate(0.0, 1.0, grad, jnp.zeros((4, 6)), hist)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-14)


def test_mises_linear_hardening_closed_form():
    """Radial return with linear hardening (mises_plasticity.rs:53-127)."""
    mu, kappa, y0, h = 80769.0, 175000.0, 1200.0, 200.0
    law = MisesPlasticityLinearHardening3D(
        {"mu": np.array([mu]), "kappa": np.array([kappa]), "y_0": np.array([y0]), "h": np.array([h])}
    )
    hist = law.init_history(1)
    exx = 0.05
    grad = make_uniaxial_strain_grad(exx, q=1)
    stress, tangent, hist1 = law.evaluate(0.0, 1.0, grad, jnp.zeros((1, 6)), hist)
    # hand-computed radial return
    eps = np.zeros(6)
    eps[0] = exx
    tr = exx
    dev = eps - tr / 3 * np.array([1, 1, 1, 0, 0, 0.0])
    s_tr = 2 * mu * dev
    s_eq = np.sqrt(1.5 * np.sum(s_tr**2))
    del_alpha = (s_eq - y0) / (3 * mu + h)
    theta = 1 - 3 * mu * del_alpha / s_eq
    expect = kappa * tr * np.array([1, 1, 1, 0, 0, 0.0]) + theta * s_tr
    np.testing.assert_allclose(np.asarray(stress[0]), expect, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hist1["alpha"][0, 0]), del_alpha, rtol=1e-12)
    # plastic strain increment from the flow rule: 1.5 del_alpha * n, which
    # makes the split exact: s_new = s_tr - 2 mu del_eps_p. (The reference
    # records sqrt(3/2) del_alpha * n — off by sqrt(2/3);
    # mises_plasticity.rs:113.)
    n = s_tr / s_eq
    np.testing.assert_allclose(
        np.asarray(hist1["plastic_strain"][0]),
        1.5 * del_alpha * n,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        theta * s_tr,
        s_tr - 2 * mu * np.asarray(hist1["plastic_strain"][0]),
        rtol=1e-12,
    )


def test_mises_linear_vs_vonmises_small_w():
    """VonMises3D with y00->y0 (perfect plasticity) matches linear hardening h->0."""
    mu, kappa, y0 = 80769.0, 175000.0, 1200.0
    von = VonMises3D(dict(p_ka=kappa, p_mu=mu, p_y0=y0, p_y00=y0, p_w=1.0))
    lin = MisesPlasticityLinearHardening3D(
        {"mu": mu, "kappa": kappa, "y_0": y0, "h": 0.0}
    )
    grad = make_uniaxial_strain_grad(0.01, q=1)
    s_v, _, _ = von.evaluate(0.0, 1.0, grad, jnp.zeros((1, 6)), von.init_history(1))
    s_l, _, _ = lin.evaluate(0.0, 1.0, grad, jnp.zeros((1, 6)), lin.init_history(1))
    np.testing.assert_allclose(np.asarray(s_v), np.asarray(s_l), rtol=1e-8)


@pytest.mark.parametrize("cls", [SpringKelvinModel, SpringMaxwellModel])
def test_sls_instant_response(cls):
    """With dt -> 0 the instantaneous stiffness governs (test_viscoelasticity.py:68-70)."""
    law = cls({"E0": 42.0, "E1": 10.0, "tau": 10.0}, Constraint.UNIAXIAL_STRESS)
    hist = law.init_history(1)
    grad = jnp.asarray([[[0.01]]])
    stress, _, h1 = law.evaluate(0.0, 1e-8, grad, jnp.zeros((1, 1)), hist)
    if cls is SpringKelvinModel:
        expected = 42.0 * 0.01  # spring E0 alone carries the instant load
    else:
        expected = (42.0 + 10.0) * 0.01  # E0 parallel E1
    np.testing.assert_allclose(np.asarray(stress[0, 0]), expected, atol=1e-8)
    np.testing.assert_allclose(np.asarray(h1["strain"][0, 0]), 0.01, atol=1e-12)
    np.testing.assert_allclose(np.asarray(h1["strain_visco"][0, 0]), 0.0, atol=1e-8)


@pytest.mark.parametrize("cls", [SpringKelvinModel, SpringMaxwellModel])
def test_sls_relaxation_limit(cls):
    """Time-step to t >> tau under held strain; check the relaxed modulus."""
    E0, E1, tau = 42.0, 10.0, 10.0
    law = cls({"E0": E0, "E1": E1, "tau": tau}, Constraint.UNIAXIAL_STRESS)
    hist = law.init_history(1)
    grad = jnp.asarray([[[0.01]]])
    stress, _, hist = law.evaluate(0.0, 1e-8, grad, jnp.zeros((1, 1)), hist)
    zero_grad = jnp.zeros((1, 1, 1))
    t = 0.0
    for _ in range(100):
        stress, _, hist = law.evaluate(t, 2.0, zero_grad, stress, hist)
        t += 2.0
    if cls is SpringKelvinModel:
        expected = E0 * E1 / (E0 + E1) * 0.01
    else:
        expected = E0 * 0.01
    np.testing.assert_allclose(np.asarray(stress[0, 0]), expected, atol=1e-8)


def test_uniaxial_strain_from_3d_wrapper():
    law3d = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    wrapped = UniaxialStrainFrom3D(law3d)
    law1d = LinearElasticityModel({"E": E, "nu": NU}, Constraint.UNIAXIAL_STRAIN)
    grad = jnp.full((5, 1, 1), 0.01)
    s_w, t_w, h_w = wrapped.evaluate(
        0.0, 1.0, grad, jnp.zeros((5, 1)), wrapped.init_history(5)
    )
    s_d, t_d, _ = law1d.evaluate(0.0, 1.0, grad, jnp.zeros((5, 1)), None)
    np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_d), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(t_w), np.asarray(t_d), rtol=1e-13)
    # shear components of the recorded 3D stress are zero (test_elasticity.py:233)
    assert np.linalg.norm(np.asarray(h_w["stress_3d"])[:, 3:6]) < 1e-14


def test_plane_strain_from_3d_wrapper():
    law3d = LinearElasticityModel({"E": E, "nu": NU}, Constraint.FULL)
    wrapped = PlaneStrainFrom3D(law3d)
    law2d = LinearElasticityModel({"E": E, "nu": NU}, Constraint.PLANE_STRAIN)
    grad = rand_grad(5, 2, seed=3)
    s_w, t_w, _ = wrapped.evaluate(
        0.0, 1.0, grad, jnp.zeros((5, 4)), wrapped.init_history(5)
    )
    s_d, t_d, _ = law2d.evaluate(0.0, 1.0, grad, jnp.zeros((5, 4)), None)
    np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_d), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(t_w), np.asarray(t_d), rtol=1e-12)


@pytest.mark.parametrize("wrapper_cls", [UniaxialStrainFrom3D, PlaneStrainFrom3D])
@pytest.mark.slow
def test_from3d_wrapper_multistep_plasticity_equivalence(wrapper_cls):
    """Committed lateral stresses must persist across steps (ADVICE r1, high).

    Drives a wrapped VonMises3D through 10 committed load increments — the way
    the solver threads state — and compares against the direct FULL 3D model on
    the identical strain path. The reference keeps the full 3D stress on the
    mutable ``stress_3d`` attribute (utils.py:228-238); we carry it as aux
    history, and losing it shows up from step 2 on (elastically) and grossly
    under plastic flow.
    """
    params = {"p_ka": 175.0, "p_mu": 80.0, "p_y0": 0.12, "p_y00": 0.25, "p_w": 50.0}
    law3d_direct = VonMises3D(params)
    wrapped = wrapper_cls(VonMises3D(params))
    gdim = wrapped.constraint.geometric_dim
    sdim = wrapped.constraint.stress_strain_dim

    q = 3
    # per-step lower-dim displacement-gradient increment (plastic by step ~3)
    rng = np.random.default_rng(7)
    if wrapper_cls is UniaxialStrainFrom3D:
        dgrad = jnp.full((q, 1, 1), 4e-4)
    else:
        base = rng.normal(size=(2, 2)) * 2e-4 + np.diag([4e-4, 1e-4])
        dgrad = jnp.asarray(np.broadcast_to(base, (q, 2, 2)))

    # matching FULL 3D gradient increment (embed in upper-left block)
    dgrad3 = jnp.zeros((q, 3, 3)).at[:, :gdim, :gdim].set(dgrad)

    s_w = jnp.zeros((q, sdim))
    h_w = wrapped.init_history(q)
    s_d = jnp.zeros((q, 6))
    h_d = law3d_direct.init_history(q)
    for step in range(10):
        t = float(step)
        s_w, _, h_w_trial = wrapped.evaluate(t, 1.0, dgrad, s_w, h_w)
        s_d, _, h_d = law3d_direct.evaluate(t, 1.0, dgrad3, s_d, h_d)
        h_w = h_w_trial  # commit
        np.testing.assert_allclose(
            np.asarray(s_w), np.asarray(s_d[:, :sdim]), rtol=1e-10,
            err_msg=f"step {step}",
        )
        # the carried full 3D stress must match the direct model exactly
        np.testing.assert_allclose(
            np.asarray(h_w["stress_3d"]), np.asarray(s_d), rtol=1e-10,
        )
    # sanity: the path actually went plastic
    assert float(jnp.max(h_d["alpha"])) > 1e-4


@pytest.mark.parametrize("make_law", [
    pytest.param(lambda: LinearElasticityModel({"E": 42000.0, "nu": 0.3}, Constraint.FULL), id="elastic"),
    pytest.param(lambda: MisesPlasticityLinearHardening3D(
        {"mu": 80769.0, "kappa": 175000.0, "y_0": 1200.0, "h": 5000.0}), id="mises-lin"),
    pytest.param(lambda: VonMises3D(
        {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0, "p_y00": 2500.0, "p_w": 200.0}), id="mises-exp"),
])
def test_consistent_tangent_matches_finite_differences(make_law):
    """The algorithmic tangent must be the exact derivative of the stress
    update (this is what gives Newton its quadratic convergence). Catches the
    reference's wrong n(x)n term in the linear-hardening model
    (comfe-rs/src/mises_plasticity.rs:119-122: +2mu*theta_bar where the
    derivative of sigma_dev = theta(eps)*s_tr(eps) gives -3mu*theta_bar for
    n = s_tr/q_eq)."""
    law = make_law()
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.normal(size=(4, 3, 3)) * 5e-3)  # well plastic
    s0 = jnp.zeros((4, 6))
    h0 = law.init_history(4)
    s_base, tg, _ = law.evaluate(0.0, 1.0, g0, s0, h0)
    fd_eps = 1e-7
    for trial in range(3):
        dg = jnp.asarray(rng.normal(size=(4, 3, 3)))
        s_p, _, _ = law.evaluate(0.0, 1.0, g0 + fd_eps * dg, s0, h0)
        fd = (s_p - s_base) / fd_eps
        de = mandel.strain_from_grad_u(dg, law.constraint)
        pred = jnp.einsum("qst,qt->qs", tg, de)
        err = float(jnp.linalg.norm(fd - pred) / jnp.linalg.norm(fd))
        assert err < 1e-4, f"trial {trial}: tangent error {err:.3e}"
