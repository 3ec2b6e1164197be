"""Mandel-notation tensor algebra for incremental small-strain constitutive models.

This is the single source of truth for the Mandel convention used throughout the
framework (shear components carry a factor of sqrt(2); strains computed from a
*displacement gradient* therefore carry 1/sqrt(2) on the symmetrized shear).

Capability parity (re-designed, not translated) with the reference:
  - /root/reference/src/fenics_constitutive/models/interfaces.py:14-73
    (StressStrainConstraint enum with stress_strain_dim / geometric_dim)
  - /root/reference/src/fenics_constitutive/models/utils.py:18-208
    (lame_parameters, get_elastic_tangent, get_identity, strain_from_grad_u)
  - /root/reference/comfe-rs/src/consts.rs + mandel.rs
    (projectors, invariants, isotropic elastic tangent and its closed-form inverse)

Unlike the reference (which keeps a numpy and a UFL twin of the strain operator in
sync by testing), there is exactly ONE strain operator here: `strain_from_grad_u`.
It is used both to feed constitutive models and — through `mandel_to_matrix` /
its transpose-adjoint — to assemble weak forms, so the two can never drift apart.

All functions are pure, shape-polymorphic over leading batch axes, dtype-preserving,
and safe under jit/vmap/grad.
"""

from __future__ import annotations

import enum
import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "Constraint",
    "SQRT2",
    "lame_parameters",
    "get_elastic_tangent",
    "get_identity",
    "strain_from_grad_u",
    "mandel_to_matrix",
    "matrix_to_mandel",
    "trace",
    "deviatoric",
    "vol_dev",
    "i1_j2_dev",
    "mises_norm",
    "sym_identity",
    "projection_vol",
    "projection_dev",
    "isotropic_elastic_tangent",
    "isotropic_elastic_tangent_inv",
]

SQRT2 = math.sqrt(2.0)
_INV_SQRT2 = 1.0 / SQRT2


class Constraint(enum.Enum):
    """Stress-strain constraint (reference: interfaces.py:14-73).

    The integer values match the reference enum so serialized configs interoperate.
    """

    UNIAXIAL_STRAIN = 1
    UNIAXIAL_STRESS = 2
    PLANE_STRAIN = 3
    PLANE_STRESS = 4
    FULL = 5

    @property
    def stress_strain_dim(self) -> int:
        return {
            Constraint.UNIAXIAL_STRAIN: 1,
            Constraint.UNIAXIAL_STRESS: 1,
            Constraint.PLANE_STRAIN: 4,
            Constraint.PLANE_STRESS: 4,
            Constraint.FULL: 6,
        }[self]

    @property
    def geometric_dim(self) -> int:
        return {
            Constraint.UNIAXIAL_STRAIN: 1,
            Constraint.UNIAXIAL_STRESS: 1,
            Constraint.PLANE_STRAIN: 2,
            Constraint.PLANE_STRESS: 2,
            Constraint.FULL: 3,
        }[self]


# Backwards-compatible alias matching the reference's public name.
StressStrainConstraint = Constraint


def lame_parameters(E: float, nu: float) -> tuple[float, float]:
    """(mu, lam) from Young's modulus and Poisson ratio (reference utils.py:18-22)."""
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, lam


def get_elastic_tangent(E: float, nu: float, constraint: Constraint) -> np.ndarray:
    """Linear-elastic tangent in Mandel notation per constraint (utils.py:25-93).

    Returned as a numpy array (host constant); convert with jnp.asarray at trace
    time so the dtype follows the computation.
    """
    mu, lam = lame_parameters(E, nu)
    if constraint == Constraint.FULL:
        D = np.array(
            [
                [2.0 * mu + lam, lam, lam, 0.0, 0.0, 0.0],
                [lam, 2.0 * mu + lam, lam, 0.0, 0.0, 0.0],
                [lam, lam, 2.0 * mu + lam, 0.0, 0.0, 0.0],
                [0.0, 0.0, 0.0, 2.0 * mu, 0.0, 0.0],
                [0.0, 0.0, 0.0, 0.0, 2.0 * mu, 0.0],
                [0.0, 0.0, 0.0, 0.0, 0.0, 2.0 * mu],
            ]
        )
    elif constraint == Constraint.PLANE_STRAIN:
        D = np.array(
            [
                [2.0 * mu + lam, lam, lam, 0.0],
                [lam, 2.0 * mu + lam, lam, 0.0],
                [lam, lam, 2.0 * mu + lam, 0.0],
                [0.0, 0.0, 0.0, 2.0 * mu],
            ]
        )
    elif constraint == Constraint.PLANE_STRESS:
        # The rank-deficient matrix: the zz row/column are zero, so sigma_zz = 0
        # emerges from the solve (reference utils.py:63-79 and
        # tests/models/test_elasticity.py:300-333).
        D = (
            E
            / (1.0 - nu**2)
            * np.array(
                [
                    [1.0, nu, 0.0, 0.0],
                    [nu, 1.0, 0.0, 0.0],
                    [0.0, 0.0, 0.0, 0.0],
                    [0.0, 0.0, 0.0, 1.0 - nu],
                ]
            )
        )
    elif constraint == Constraint.UNIAXIAL_STRAIN:
        D = np.array([[E * (1.0 - nu) / ((1.0 + nu) * (1.0 - 2.0 * nu))]])
    elif constraint == Constraint.UNIAXIAL_STRESS:
        D = np.array([[E]])
    else:  # pragma: no cover
        msg = f"Constraint {constraint} not implemented"
        raise NotImplementedError(msg)
    return D


def get_identity(constraint: Constraint) -> np.ndarray:
    """Second-order identity in Mandel notation per constraint (utils.py:96-129)."""
    sdim = constraint.stress_strain_dim
    I2 = np.zeros(sdim)
    n_ones = {
        Constraint.FULL: 3,
        Constraint.PLANE_STRAIN: 3,
        Constraint.PLANE_STRESS: 2,
        Constraint.UNIAXIAL_STRAIN: 1,
        Constraint.UNIAXIAL_STRESS: 1,
    }[constraint]
    I2[:n_ones] = 1.0
    return I2


# Shear index pairs for the FULL constraint: Mandel slots 3,4,5 are the
# symmetrized (0,1), (0,2), (1,2) pairs (reference utils.py:187-204 and
# comfe-rs/src/mandel.rs:143-171).
_SHEAR_PAIRS_3D = ((0, 1), (0, 2), (1, 2))


def strain_from_grad_u(grad_u: jnp.ndarray, constraint: Constraint) -> jnp.ndarray:
    """Mandel strain from a (generally non-symmetric) displacement gradient.

    Args:
        grad_u: ``[..., g, g]`` displacement-gradient tensors (or increments).
        constraint: the stress-strain constraint.

    Returns:
        ``[..., s]`` Mandel strain. Matches reference utils.py:132-208 exactly,
        including the zero zz-slot for the plane constraints.
    """
    g = constraint.geometric_dim
    if grad_u.shape[-2:] != (g, g):
        msg = f"grad_u trailing shape {grad_u.shape[-2:]} != ({g},{g}) for {constraint}"
        raise ValueError(msg)

    if constraint in (Constraint.UNIAXIAL_STRAIN, Constraint.UNIAXIAL_STRESS):
        return grad_u[..., 0, 0:1]
    if constraint in (Constraint.PLANE_STRAIN, Constraint.PLANE_STRESS):
        zero = jnp.zeros_like(grad_u[..., 0, 0])
        return jnp.stack(
            [
                grad_u[..., 0, 0],
                grad_u[..., 1, 1],
                zero,
                _INV_SQRT2 * (grad_u[..., 0, 1] + grad_u[..., 1, 0]),
            ],
            axis=-1,
        )
    # FULL
    comps = [grad_u[..., 0, 0], grad_u[..., 1, 1], grad_u[..., 2, 2]]
    for i, j in _SHEAR_PAIRS_3D:
        comps.append(_INV_SQRT2 * (grad_u[..., i, j] + grad_u[..., j, i]))
    return jnp.stack(comps, axis=-1)


@lru_cache(maxsize=None)
def _mandel_matrix_map(constraint: Constraint) -> np.ndarray:
    """Host constant ``T[s, i, j]`` with ``tensor_ij = sum_s T[s,i,j] * mandel_s``.

    ``T`` is simultaneously (a) the inverse map from a Mandel *stress* vector to
    its symmetric tensor and (b) the adjoint used in weak-form assembly:
    ``inner(eps_mandel(v), sigma_mandel) == grad(v) : (T . sigma_mandel)``.
    Only the components that live in the geometric dimension appear (the zz slot
    of the plane constraints has no 2D tensor image).
    """
    g = constraint.geometric_dim
    s = constraint.stress_strain_dim
    T = np.zeros((s, g, g))
    if constraint in (Constraint.UNIAXIAL_STRAIN, Constraint.UNIAXIAL_STRESS):
        T[0, 0, 0] = 1.0
    elif constraint in (Constraint.PLANE_STRAIN, Constraint.PLANE_STRESS):
        T[0, 0, 0] = 1.0
        T[1, 1, 1] = 1.0
        # slot 2 is zz: no image in 2D
        T[3, 0, 1] = T[3, 1, 0] = _INV_SQRT2
    else:
        for d in range(3):
            T[d, d, d] = 1.0
        for k, (i, j) in enumerate(_SHEAR_PAIRS_3D):
            T[3 + k, i, j] = T[3 + k, j, i] = _INV_SQRT2
    return T


def mandel_to_matrix(mandel: jnp.ndarray, constraint: Constraint) -> jnp.ndarray:
    """Mandel stress vector ``[..., s]`` -> symmetric tensor ``[..., g, g]``."""
    T = jnp.asarray(_mandel_matrix_map(constraint), dtype=mandel.dtype)
    return jnp.einsum("...s,sij->...ij", mandel, T)


def matrix_to_mandel(tensor: jnp.ndarray, constraint: Constraint) -> jnp.ndarray:
    """Symmetric tensor ``[..., g, g]`` -> Mandel vector ``[..., s]`` (x sqrt2 shear)."""
    # For symmetric input this is the exact inverse of mandel_to_matrix.
    return strain_from_grad_u(tensor, constraint)


# ---------------------------------------------------------------------------
# Invariants and projectors (reference comfe-rs/src/mandel.rs, consts.rs)
# ---------------------------------------------------------------------------


def trace(mandel: jnp.ndarray) -> jnp.ndarray:
    """First invariant I1 = tr(sigma); works for sdim in {1, 4, 6}."""
    n = min(3, mandel.shape[-1])
    return jnp.sum(mandel[..., :n], axis=-1)


def deviatoric(mandel: jnp.ndarray) -> jnp.ndarray:
    """Deviatoric part in Mandel notation."""
    sdim = mandel.shape[-1]
    n = min(3, sdim)
    vol = trace(mandel)[..., None] / 3.0
    eye = jnp.concatenate(
        [jnp.ones(n, mandel.dtype), jnp.zeros(sdim - n, mandel.dtype)]
    )
    return mandel - vol * eye


def vol_dev(mandel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(volumetric scalar = tr/3, deviatoric vector)."""
    return trace(mandel) / 3.0, deviatoric(mandel)


def i1_j2_dev(mandel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(I1, J2, dev); J2 = 0.5 * dev:dev — the Mandel norm makes this a plain dot."""
    i1 = trace(mandel)
    dev = deviatoric(mandel)
    j2 = 0.5 * jnp.sum(dev * dev, axis=-1)
    return i1, j2, dev


def mises_norm(mandel: jnp.ndarray) -> jnp.ndarray:
    """sqrt(3 J2) (reference mandel.rs:30-33)."""
    _, j2, _ = i1_j2_dev(mandel)
    return jnp.sqrt(3.0 * j2)


@lru_cache(maxsize=None)
def sym_identity(sdim: int) -> np.ndarray:
    """Mandel second-order identity [1,1,1,0,...] (comfe-rs consts.rs sym_id)."""
    out = np.zeros(sdim)
    out[: min(3, sdim)] = 1.0
    return out


@lru_cache(maxsize=None)
def projection_vol(sdim: int) -> np.ndarray:
    """P_vol = 1/3 (I2 x I2) (comfe-rs consts.rs projection_vol)."""
    i2 = sym_identity(sdim)
    return np.outer(i2, i2) / 3.0


@lru_cache(maxsize=None)
def projection_dev(sdim: int) -> np.ndarray:
    """P_dev = I4 - P_vol (comfe-rs consts.rs projection_dev)."""
    return np.eye(sdim) - projection_vol(sdim)


def isotropic_elastic_tangent(mu, kappa, sdim: int = 6) -> jnp.ndarray:
    """2 mu P_dev + 3 kappa P_vol in Mandel notation (mandel.rs:126-128).

    mu/kappa may be python floats or traced scalars.
    """
    pdev = jnp.asarray(projection_dev(sdim))
    pvol = jnp.asarray(projection_vol(sdim))
    return 2.0 * mu * pdev + 3.0 * kappa * pvol


def isotropic_elastic_tangent_inv(mu, kappa, sdim: int = 6) -> jnp.ndarray:
    """Closed-form inverse via (1/(4 mu), 1/(9 kappa)) (mandel.rs:137-141)."""
    return isotropic_elastic_tangent(1.0 / (4.0 * mu), 1.0 / (9.0 * kappa), sdim)
