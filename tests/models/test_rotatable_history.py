"""Rotatable history semantics (reference QDim::Rotatable{Vector,Matrix},
comfe-rs/src/interfaces.rs:39-67): entries a model declares frame-attached
co-rotate under a rotation increment; scalars pass through."""

import jax.numpy as jnp
import numpy as np

from fenics_constitutive_tpu.models.interfaces import (
    Constraint,
    IncrSmallStrainModel,
    rotate_history,
)
from fenics_constitutive_tpu.ops import mandel


class _RotModel(IncrSmallStrainModel):
    """Minimal model with one rotatable entry of each supported shape."""

    @property
    def constraint(self):
        return Constraint.FULL

    @property
    def history_dim(self):
        return {
            "plastic_strain": 6,  # Mandel vector
            "fiber": 3,  # geometric vector
            "fabric": (3, 3),  # matrix
            "alpha": 1,  # scalar — must NOT rotate
        }

    @property
    def rotatable_history(self):
        return frozenset({"plastic_strain", "fiber", "fabric"})

    def evaluate(self, t, del_t, grad_del_u, stress, history):
        raise NotImplementedError  # not needed for these tests


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _rand_history(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "plastic_strain": jnp.asarray(rng.normal(size=(n, 6))),
        "fiber": jnp.asarray(rng.normal(size=(n, 3))),
        "fabric": jnp.asarray(rng.normal(size=(n, 3, 3))),
        "alpha": jnp.asarray(rng.normal(size=(n, 1))),
    }


def test_identity_rotation_is_noop():
    m = _RotModel()
    h = _rand_history(7)
    out = rotate_history(m, h, np.eye(3))
    for k in h:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(h[k]), atol=1e-14)


def test_mandel_vector_rotates_as_tensor_conjugation():
    m = _RotModel()
    h = _rand_history(5, seed=1)
    R = _rot_z(0.7)
    out = rotate_history(m, h, R)
    # explicit check: mandel(R A R^T)
    A = np.asarray(mandel.mandel_to_matrix(h["plastic_strain"], Constraint.FULL))
    expect = np.einsum("ij,qjk,lk->qil", R, A, R)
    got = np.asarray(
        mandel.mandel_to_matrix(out["plastic_strain"], Constraint.FULL)
    )
    np.testing.assert_allclose(got, expect, atol=1e-12)
    # Mandel is an isometry: norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["plastic_strain"]), axis=1),
        np.linalg.norm(np.asarray(h["plastic_strain"]), axis=1),
        rtol=1e-12,
    )


def test_matrix_vector_and_scalar_rules():
    m = _RotModel()
    h = _rand_history(4, seed=2)
    R = _rot_z(-1.2)
    out = rotate_history(m, h, R)
    np.testing.assert_allclose(
        np.asarray(out["fabric"]),
        np.einsum("ij,qjk,lk->qil", R, np.asarray(h["fabric"]), R),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out["fiber"]),
        np.einsum("ij,qj->qi", R, np.asarray(h["fiber"])),
        atol=1e-12,
    )
    # scalar entries are frame-free and untouched
    np.testing.assert_array_equal(np.asarray(out["alpha"]), np.asarray(h["alpha"]))


def test_per_qp_rotations_and_inverse_roundtrip():
    m = _RotModel()
    n = 6
    h = _rand_history(n, seed=3)
    thetas = np.linspace(0.1, 2.0, n)
    R = np.stack([_rot_z(t) for t in thetas])
    out = rotate_history(m, h, R)
    back = rotate_history(m, out, np.transpose(R, (0, 2, 1)))
    for k in h:
        np.testing.assert_allclose(
            np.asarray(back[k]), np.asarray(h[k]), atol=1e-12
        )


def test_default_models_declare_nothing_rotatable():
    from fenics_constitutive_tpu.models import VonMises3D

    m = VonMises3D(
        {"p_ka": 175000.0, "p_mu": 80769.0, "p_y0": 1200.0,
         "p_y00": 2500.0, "p_w": 200.0}
    )
    assert m.rotatable_history == frozenset()
    h = m.init_history(3)
    assert rotate_history(m, h, np.eye(3)) is h  # no-op fast path
