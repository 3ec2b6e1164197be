"""Drucker-Prager + generic implicit return map unit tests.

The reference ships these models Rust-side with no Python-level tests
(bindings exported in rust_models.py:84-161, exercised only via cargo test);
here they get direct QP-batch coverage: elastic consistency, yield-surface
return, Mises-degenerate limit, hyperbolic-to-classic limit, non-associated
(deviatoric) flow, and jit cleanliness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.models import (
    DruckerPrager3D,
    DruckerPragerHyperbolic3D,
    MisesPlasticityLinearHardening3D,
)
from fenics_constitutive_tpu.ops import mandel

MU, KAPPA = 80769.0, 175000.0


def make_grad(exx, q=1, shear=0.0):
    g = jnp.zeros((q, 3, 3)).at[:, 0, 0].set(exx)
    if shear:
        g = g.at[:, 0, 1].set(shear)
    return g


def dp_params(a=1000.0, b=0.2, b_flow=None, d=None):
    p = {"mu": MU, "kappa": KAPPA, "a": a, "b": b, "b_flow": b if b_flow is None else b_flow}
    if d is not None:
        p["d"] = d
    return p


def test_elastic_step_matches_hooke():
    law = DruckerPrager3D(dp_params())
    hist = law.init_history(2)
    grad = make_grad(1e-6, q=2)
    stress, tangent, hist1 = law.evaluate(0.0, 1.0, grad, jnp.zeros((2, 6)), hist)
    C = np.asarray(mandel.isotropic_elastic_tangent(MU, KAPPA))
    eps = np.asarray(mandel.strain_from_grad_u(grad, law.constraint))
    np.testing.assert_allclose(np.asarray(stress), eps @ C.T, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tangent[0]), C, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hist1["alpha"]), 0.0, atol=0)


@pytest.mark.parametrize(
    "cls,params",
    [
        (DruckerPrager3D, dp_params()),
        (DruckerPragerHyperbolic3D, dp_params(d=50.0)),
        (DruckerPrager3D, dp_params(b_flow=0.0)),
    ],
)
@pytest.mark.slow
def test_plastic_return_lands_on_yield_surface(cls, params):
    law = cls(params)
    hist = law.init_history(3)
    # tension + shear: past yield (f_tr ~ +200) but I1 stays below the
    # cone tip a/b = 5000 throughout the return
    grad = make_grad(0.005, q=3, shear=0.006)
    stress, tangent, hist1 = law.evaluate(0.0, 1.0, grad, jnp.zeros((3, 6)), hist)
    s = np.asarray(stress)
    assert np.all(np.isfinite(s))
    f = np.asarray(jax.vmap(lambda sig: law._f(sig, None))(stress))
    np.testing.assert_allclose(f, 0.0, atol=1e-8)
    assert np.all(np.asarray(hist1["alpha"]) > 0)


def test_non_associated_flow_is_deviatoric():
    """b_flow = 0 gives radial return: plastic correction changes no pressure
    (classic.rs:31 'for b=0 the return direction is purely deviatoric')."""
    law = DruckerPrager3D(dp_params(b_flow=0.0))
    hist = law.init_history(1)
    grad = make_grad(0.005, shear=0.006)
    stress, _, _ = law.evaluate(0.0, 1.0, grad, jnp.zeros((1, 6)), hist)
    C = np.asarray(mandel.isotropic_elastic_tangent(MU, KAPPA))
    eps = np.asarray(mandel.strain_from_grad_u(grad, law.constraint))
    sigma_tr = eps @ C.T
    np.testing.assert_allclose(
        np.asarray(mandel.trace(stress)),
        np.asarray(mandel.trace(jnp.asarray(sigma_tr))),
        rtol=1e-10,
    )


def test_degenerate_b0_matches_mises():
    """b = b_flow = 0: f = sqrt(J2) - a == Mises with y0 = sqrt(3) a, h = 0."""
    a = 1000.0
    dp = DruckerPrager3D(dp_params(a=a, b=0.0, b_flow=0.0))
    mises = MisesPlasticityLinearHardening3D(
        {"mu": MU, "kappa": KAPPA, "y_0": np.sqrt(3.0) * a, "h": 0.0}
    )
    grad = make_grad(0.02, shear=0.002)
    s_dp, t_dp, _ = dp.evaluate(0.0, 1.0, grad, jnp.zeros((1, 6)), dp.init_history(1))
    s_m, t_m, _ = mises.evaluate(
        0.0, 1.0, grad, jnp.zeros((1, 6)), mises.init_history(1)
    )
    np.testing.assert_allclose(np.asarray(s_dp), np.asarray(s_m), rtol=1e-7)


def test_hyperbolic_approaches_classic():
    grad = make_grad(0.005, shear=0.006)
    classic = DruckerPrager3D(dp_params())
    s_c, _, _ = classic.evaluate(
        0.0, 1.0, grad, jnp.zeros((1, 6)), classic.init_history(1)
    )
    hyper = DruckerPragerHyperbolic3D(dp_params(d=1e-4))
    s_h, _, _ = hyper.evaluate(
        0.0, 1.0, grad, jnp.zeros((1, 6)), hyper.init_history(1)
    )
    np.testing.assert_allclose(np.asarray(s_h), np.asarray(s_c), rtol=1e-6, atol=1e-4)


def test_jit_and_mixed_batch():
    law = DruckerPrager3D(dp_params())
    hist = law.init_history(2)
    grad = jnp.zeros((2, 3, 3)).at[0, 0, 0].set(1e-7).at[1, 0, 0].set(0.005)
    grad = grad.at[1, 0, 1].set(0.006)

    @jax.jit
    def step(law_, g, s, h):
        return law_.evaluate(0.0, 1.0, g, s, h)

    s1, t1, h1 = step(law, grad, jnp.zeros((2, 6)), hist)
    s2, t2, h2 = law.evaluate(0.0, 1.0, grad, jnp.zeros((2, 6)), hist)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-14)
    a = np.asarray(h1["alpha"]).ravel()
    assert a[0] == 0.0 and a[1] > 0.0


@pytest.mark.slow
def test_consistent_tangent_matches_fd():
    """Consistent tangent == finite-difference d sigma / d eps through the
    return map (validates the (J^-1 C) block extraction)."""
    law = DruckerPrager3D(dp_params())
    grad = make_grad(0.005, shear=0.006)
    hist = law.init_history(1)
    _, tangent, _ = law.evaluate(0.0, 1.0, grad, jnp.zeros((1, 6)), hist)

    def stress_of_eps(eps_flat):
        # run the return map directly on a Mandel strain increment
        from fenics_constitutive_tpu.models.plasticity_general import (
            implicit_return_map,
        )

        C = mandel.isotropic_elastic_tangent(MU, KAPPA)
        s, _, _, _ = implicit_return_map(
            law._f,
            law._g,
            C,
            jnp.zeros((1, 6)),
            eps_flat[None, :],
            jnp.zeros((1, 1)),
            atol=1e-12,
            rtol=1e-12,
            maxit=50,
        )
        return s[0]

    eps0 = mandel.strain_from_grad_u(grad, law.constraint)[0]
    fd = np.zeros((6, 6))
    h = 1e-7
    for j in range(6):
        ep = eps0.at[j].add(h)
        em = eps0.at[j].add(-h)
        fd[:, j] = np.asarray((stress_of_eps(ep) - stress_of_eps(em)) / (2 * h))
    np.testing.assert_allclose(np.asarray(tangent[0]), fd, rtol=5e-5, atol=1e-2)
