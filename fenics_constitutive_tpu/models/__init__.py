"""Constitutive model library (pure-JAX, QP-batched, pytree-registered).

Parity map to the reference model layer
(/root/reference/src/fenics_constitutive/models/__init__.py:16-22 plus the
Rust-backed models in models/rust_models.py:84-161):

  LinearElasticityModel            -> linear_elasticity.LinearElasticityModel
  VonMises3D                       -> mises.VonMises3D
  MisesPlasticityLinearHardening3D -> mises.MisesPlasticityLinearHardening3D
  SpringKelvinModel                -> viscoelasticity.SpringKelvinModel
  SpringMaxwellModel               -> viscoelasticity.SpringMaxwellModel
  DruckerPrager3D                  -> drucker_prager.DruckerPrager3D
  DruckerPragerHyperbolic3D        -> drucker_prager.DruckerPragerHyperbolic3D
  LinearElasticity3D (rust)        -> linear_elasticity.LinearElasticity3D
  UniaxialStrainFrom3D             -> conversions.UniaxialStrainFrom3D
  PlaneStrainFrom3D                -> conversions.PlaneStrainFrom3D
"""

from ..ops.mandel import Constraint, StressStrainConstraint
from .conversions import PlaneStrainFrom3D, UniaxialStrainFrom3D
from .drucker_prager import DruckerPrager3D, DruckerPragerHyperbolic3D
from .interfaces import IncrSmallStrainModel
from .linear_elasticity import LinearElasticityModel
from .mises import MisesPlasticityLinearHardening3D, VonMises3D
from .viscoelasticity import SpringKelvinModel, SpringMaxwellModel

__all__ = [
    "Constraint",
    "StressStrainConstraint",
    "IncrSmallStrainModel",
    "LinearElasticityModel",
    "VonMises3D",
    "MisesPlasticityLinearHardening3D",
    "DruckerPrager3D",
    "DruckerPragerHyperbolic3D",
    "SpringKelvinModel",
    "SpringMaxwellModel",
    "UniaxialStrainFrom3D",
    "PlaneStrainFrom3D",
]
