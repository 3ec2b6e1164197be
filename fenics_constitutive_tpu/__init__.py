"""fenics_constitutive_tpu — a TPU-native framework for nonlinear constitutive
material models in finite-element simulations.

Built from scratch in JAX (XLA / pjit / Pallas) with the same capabilities as
BAMresearch/fenics-constitutive (reference mounted at /root/reference): an
incremental small-strain solver driven by a minimal, interchangeable model
interface in Mandel notation, a model library (elasticity, von Mises and
Drucker-Prager plasticity, SLS viscoelasticity), quadrature-point history
state, multi-material subdomains, and global norms — plus its own FEM core
(meshes, elements, quadrature, matrix-free Newton-Krylov) where the reference
wraps dolfinx/PETSc, and GSPMD sharding where the reference uses MPI.

Unlike the reference's empty top-level __init__ (its README imports only work
via subpackages, see SURVEY §2.1 P15), the public API is re-exported here.
"""

from . import models, ops
from .models import (
    Constraint,
    IncrSmallStrainModel,
    LinearElasticityModel,
    MisesPlasticityLinearHardening3D,
    PlaneStrainFrom3D,
    SpringKelvinModel,
    SpringMaxwellModel,
    StressStrainConstraint,
    UniaxialStrainFrom3D,
    VonMises3D,
)

__version__ = "0.1.0"

__all__ = [
    "models",
    "ops",
    "Constraint",
    "StressStrainConstraint",
    "IncrSmallStrainModel",
    "LinearElasticityModel",
    "VonMises3D",
    "MisesPlasticityLinearHardening3D",
    "SpringKelvinModel",
    "SpringMaxwellModel",
    "UniaxialStrainFrom3D",
    "PlaneStrainFrom3D",
]
