"""Mandel-convention unit tests.

Mirrors the reference's literal expected vectors
(/root/reference/tests/models/test_conversions.py:14-44 and
comfe-rs/src/mandel.rs:193-205), plus round-trip/adjoint identities that replace
the reference's UFL-vs-numpy equivalence test (test_conversions.py:57-98) —
here there is only ONE strain operator, so we check its algebraic adjoints.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenics_constitutive_tpu.ops import mandel
from fenics_constitutive_tpu.ops.mandel import Constraint

SQ2 = 2.0**0.5


def test_strain_from_grad_u_3d():
    grad = jnp.asarray(np.arange(1.0, 10.0).reshape(1, 3, 3))
    strain = mandel.strain_from_grad_u(grad, Constraint.FULL)
    expected = np.array([1.0, 5.0, 9.0, (2 + 4) / SQ2, (3 + 7) / SQ2, (6 + 8) / SQ2])
    np.testing.assert_allclose(np.asarray(strain[0]), expected, rtol=0, atol=1e-14)


def test_strain_from_grad_u_2d():
    grad = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    for c in (Constraint.PLANE_STRAIN, Constraint.PLANE_STRESS):
        strain = mandel.strain_from_grad_u(grad, c)
        expected = np.array([1.0, 4.0, 0.0, (2 + 3) / SQ2])
        np.testing.assert_allclose(np.asarray(strain[0]), expected, atol=1e-14)


def test_strain_from_grad_u_1d():
    grad = jnp.asarray([[[2.5]]])
    for c in (Constraint.UNIAXIAL_STRAIN, Constraint.UNIAXIAL_STRESS):
        strain = mandel.strain_from_grad_u(grad, c)
        np.testing.assert_allclose(np.asarray(strain[0]), [2.5], atol=1e-14)


@pytest.mark.parametrize("constraint", list(Constraint))
def test_mandel_matrix_roundtrip(constraint):
    """matrix_to_mandel(mandel_to_matrix(s)) == s on the geometric components."""
    rng = np.random.default_rng(0)
    s = constraint.stress_strain_dim
    vec = jnp.asarray(rng.normal(size=(7, s)))
    if constraint in (Constraint.PLANE_STRAIN, Constraint.PLANE_STRESS):
        # the zz slot has no 2D image; zero it for the round-trip check
        vec = vec.at[:, 2].set(0.0)
    back = mandel.matrix_to_mandel(mandel.mandel_to_matrix(vec, constraint), constraint)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vec), atol=1e-14)


@pytest.mark.parametrize("constraint", list(Constraint))
def test_weak_form_adjoint_identity(constraint):
    """inner(eps_mandel(v), sigma) == grad_v : mandel_to_matrix(sigma).

    This is the identity that lets assembly work entirely in Mandel space; it is
    the substitute for the reference's symbolic/array twin-check
    (tests/models/test_conversions.py:57-98).
    """
    rng = np.random.default_rng(1)
    g = constraint.geometric_dim
    s = constraint.stress_strain_dim
    grad_v = jnp.asarray(rng.normal(size=(11, g, g)))
    sigma = jnp.asarray(rng.normal(size=(11, s)))
    lhs = jnp.sum(mandel.strain_from_grad_u(grad_v, constraint) * sigma, axis=-1)
    rhs = jnp.einsum(
        "qij,qij->q", grad_v, mandel.mandel_to_matrix(sigma, constraint)
    )
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_isotropic_tangent_matches_lame_form():
    """2 mu P_dev + 3 kappa P_vol equals the (E, nu) Hooke matrix (mandel.rs:207-214)."""
    mu, kappa = 1.2e9, 1.6e9
    lam = kappa - 2.0 * mu / 3.0
    expected = np.array(
        [
            [2 * mu + lam, lam, lam, 0, 0, 0],
            [lam, 2 * mu + lam, lam, 0, 0, 0],
            [lam, lam, 2 * mu + lam, 0, 0, 0],
            [0, 0, 0, 2 * mu, 0, 0],
            [0, 0, 0, 0, 2 * mu, 0],
            [0, 0, 0, 0, 0, 2 * mu],
        ]
    )
    got = np.asarray(mandel.isotropic_elastic_tangent(mu, kappa))
    np.testing.assert_allclose(got, expected, rtol=1e-14)


def test_isotropic_tangent_inverse():
    mu, kappa = 1.2e9, 1.6e9
    t = np.asarray(mandel.isotropic_elastic_tangent(mu, kappa))
    tinv = np.asarray(mandel.isotropic_elastic_tangent_inv(mu, kappa))
    np.testing.assert_allclose(t @ tinv, np.eye(6), atol=1e-14)


def test_get_elastic_tangent_consistency():
    """FULL get_elastic_tangent(E, nu) == isotropic_elastic_tangent(mu, kappa)."""
    E, nu = 42.0, 0.3
    mu = E / (2 * (1 + nu))
    kappa = E / (3 * (1 - 2 * nu))
    a = mandel.get_elastic_tangent(E, nu, Constraint.FULL)
    b = np.asarray(mandel.isotropic_elastic_tangent(mu, kappa))
    np.testing.assert_allclose(a, b, rtol=1e-13)


def test_invariants():
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.normal(size=(5, 6)))
    i1, j2, dev = mandel.i1_j2_dev(v)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(v[:, :3].sum(axis=1)))
    np.testing.assert_allclose(np.asarray(mandel.trace(dev)), 0.0, atol=1e-13)
    # Mandel dot == tensor double contraction, so J2 = 0.5 dev:dev holds directly
    np.testing.assert_allclose(
        np.asarray(j2), 0.5 * np.sum(np.asarray(dev) ** 2, axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(mandel.mises_norm(v)), np.sqrt(3.0 * np.asarray(j2))
    )


def test_projectors():
    """Orthogonality/idempotence (comfe-rs/src/consts.rs:117-132)."""
    pv, pd = mandel.projection_vol(6), mandel.projection_dev(6)
    np.testing.assert_allclose(pv @ pv, pv, atol=1e-15)
    np.testing.assert_allclose(pd @ pd, pd, atol=1e-15)
    np.testing.assert_allclose(pv @ pd, np.zeros((6, 6)), atol=1e-15)
    np.testing.assert_allclose(pv + pd, np.eye(6), atol=1e-15)
