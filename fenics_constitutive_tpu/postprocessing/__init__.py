"""Postprocessing: global norms over quadrature fields and dof vectors."""

from .norms import dof_norm, qp_norm

__all__ = ["qp_norm", "dof_norm"]
