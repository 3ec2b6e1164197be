"""Tensor/Mandel algebra and (later) Pallas kernels for the hot constitutive ops."""

from . import mandel
from .mandel import (
    Constraint,
    StressStrainConstraint,
    get_elastic_tangent,
    get_identity,
    isotropic_elastic_tangent,
    isotropic_elastic_tangent_inv,
    lame_parameters,
    mandel_to_matrix,
    matrix_to_mandel,
    strain_from_grad_u,
)

__all__ = [
    "mandel",
    "Constraint",
    "StressStrainConstraint",
    "get_elastic_tangent",
    "get_identity",
    "isotropic_elastic_tangent",
    "isotropic_elastic_tangent_inv",
    "lame_parameters",
    "mandel_to_matrix",
    "matrix_to_mandel",
    "strain_from_grad_u",
]
