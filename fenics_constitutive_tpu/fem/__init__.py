"""Own minimal FEM core: meshes, Lagrange elements, quadrature, dofmaps,
kinematics, and segment-sum assembly — the substrate the reference outsources
to dolfinx/basix/UFL/PETSc (SURVEY §1 'External FEM substrate')."""

from .assembly import (
    assemble_jacobi_diag,
    assemble_residual,
    grad_at_qp,
    tangent_matvec,
)
from .bcs import DirichletBC
from .elements import gauss_rule, tabulate_element
from .kinematics import Geometry, precompute_geometry
from .mesh import Mesh, unit_cube_mesh, unit_interval_mesh, unit_square_mesh
from .spaces import FunctionSpace

__all__ = [
    "Mesh",
    "unit_interval_mesh",
    "unit_square_mesh",
    "unit_cube_mesh",
    "FunctionSpace",
    "DirichletBC",
    "Geometry",
    "precompute_geometry",
    "gauss_rule",
    "tabulate_element",
    "grad_at_qp",
    "assemble_residual",
    "assemble_jacobi_diag",
    "tangent_matvec",
]
