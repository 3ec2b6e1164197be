"""Global norms over quadrature fields.

Analog of the reference's postprocessing.norm
(/root/reference/src/fenics_constitutive/postprocessing/error_estimation.py:11-21):
"l2" assembles integral(f . f) dx and takes a sqrt, "inf" is the max norm. The
MPI allreduce becomes a psum when the field is sharded (see parallel.sharding);
on a single device these are plain reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["qp_norm", "dof_norm", "norm"]


def qp_norm(
    field: jnp.ndarray, w_detJ: jnp.ndarray, norm_type: str = "l2"
) -> jnp.ndarray:
    """Norm of a quadrature-point field.

    Args:
        field: [C, Q] or [C, Q, k] values at quadrature points.
        w_detJ: [C, Q] quadrature weights (problem.dxm).
        norm_type: "l2" (integral norm) or "inf" (max abs).
    """
    if norm_type == "l2":
        sq = field**2 if field.ndim == 2 else jnp.sum(field**2, axis=-1)
        return jnp.sqrt(jnp.sum(sq * w_detJ))
    if norm_type == "inf":
        return jnp.max(jnp.abs(field))
    msg = f"unknown norm type {norm_type}"
    raise ValueError(msg)


def dof_norm(vec: jnp.ndarray, norm_type: str = "l2") -> jnp.ndarray:
    """Norm of a global dof vector."""
    if norm_type == "l2":
        return jnp.linalg.norm(vec)
    if norm_type == "inf":
        return jnp.max(jnp.abs(vec))
    msg = f"unknown norm type {norm_type}"
    raise ValueError(msg)


def norm(f, dx, comm=None, norm_type: str = "l2"):
    """Reference-signature alias (error_estimation.py:11-21): ``norm(f, dx,
    comm, norm_type)``. ``dx`` is the quadrature measure (problem.dxm);
    ``comm`` is accepted for drop-in compatibility and ignored — the reduction
    is global across shards by construction (psum under GSPMD)."""
    del comm
    return qp_norm(f, dx, norm_type)
