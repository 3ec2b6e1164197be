"""Element-local compute + scatter-add assembly, all in Mandel space.

This replaces the reference's UFL forms + ffcx kernels + PETSc assembly
(_solver.py:87-101 and the external dolfinx assembly): the residual is
``r_e = int grad(v) : T(sigma_mandel)`` computed by einsum over ``[C, Q, ...]``
arrays and scattered with a deterministic segment add; the tangent is applied
matrix-free (``B^T C B v``) so no global matrix ever exists — the analog of
PETSc's assembled Jacobian is a JVP-style operator that XLA fuses end to end.

All functions are pure and jit-safe; the cell axis is the GSPMD sharding axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import mandel
from ..ops.mandel import Constraint
from .kinematics import Geometry

__all__ = [
    "gather_element_dofs",
    "grad_at_qp",
    "assemble_residual",
    "tangent_matvec",
    "assemble_jacobi_diag",
]


def gather_element_dofs(u: jnp.ndarray, dofmap: jnp.ndarray) -> jnp.ndarray:
    """u[ndofs] -> u_e[C, n, vs]."""
    return u[dofmap]


def grad_at_qp(u: jnp.ndarray, dofmap: jnp.ndarray, geo: Geometry) -> jnp.ndarray:
    """Displacement gradient at QPs in nabla_grad convention:
    ``grad[c, q, i, j] = d u_j / d x_i`` (matching the flat layout the
    reference feeds models, see SURVEY §7 'nabla_grad orientation')."""
    u_e = u[dofmap]  # [C, n, vs]
    return jnp.einsum("cqai,caj->cqij", geo.dN_dx, u_e)


def _scatter_add(
    ndofs: int, dofmap: jnp.ndarray, values: jnp.ndarray
) -> jnp.ndarray:
    """Deterministic segment add of element vectors into a global dof vector."""
    out = jnp.zeros((ndofs,), values.dtype)
    return out.at[dofmap.reshape(-1)].add(
        values.reshape(-1), mode="drop", unique_indices=False
    )


def assemble_residual(
    sigma: jnp.ndarray,  # [C, Q, s] Mandel stress
    dofmap: jnp.ndarray,  # [C, n, vs]
    geo: Geometry,
    constraint: Constraint,
    ndofs: int,
) -> jnp.ndarray:
    """r = ∫ eps_mandel(v) · sigma dx, assembled over all cells.

    Uses the adjoint identity inner(eps_m(v), sigma) = grad(v) : T(sigma)
    (see ops.mandel.mandel_to_matrix), so the weak form and the model input
    share one strain operator by construction.
    """
    sig_t = mandel.mandel_to_matrix(sigma, constraint)  # [C, Q, g, g]
    f_e = jnp.einsum("cq,cqai,cqij->caj", geo.w_detJ, geo.dN_dx, sig_t)
    return _scatter_add(ndofs, dofmap, f_e)


def tangent_matvec(
    v: jnp.ndarray,  # [ndofs]
    tangent: jnp.ndarray,  # [C, Q, s, s]
    dofmap: jnp.ndarray,
    geo: Geometry,
    constraint: Constraint,
    ndofs: int,
) -> jnp.ndarray:
    """Matrix-free action of the consistent tangent: v -> A v."""
    grad_v = grad_at_qp(v, dofmap, geo)
    eps_v = mandel.strain_from_grad_u(grad_v, constraint)  # [C, Q, s]
    sig_v = jnp.einsum("cqst,cqt->cqs", tangent, eps_v)
    return assemble_residual(sig_v, dofmap, geo, constraint, ndofs)


def assemble_jacobi_diag(
    tangent: jnp.ndarray,  # [C, Q, s, s]
    dofmap: jnp.ndarray,
    geo: Geometry,
    constraint: Constraint,
    ndofs: int,
) -> jnp.ndarray:
    """diag(A) for Jacobi preconditioning of the matrix-free operator.

    diag contribution of local dof (a, j): sum_q w B_{(a,j)}^T C B_{(a,j)} with
    B_{(a,j)}[s] = M[s, i, j] dN_a/dx_i. Loops over the (static, small) local
    node index a to avoid materializing the full B tensor.
    """
    M = jnp.asarray(mandel._mandel_matrix_map(constraint), tangent.dtype)  # [s,g,g]
    n = dofmap.shape[1]
    cols = []
    for a in range(n):
        dn_a = geo.dN_dx[:, :, a, :]  # [C, Q, g]
        B_a = jnp.einsum("sij,cqi->cqsj", M, dn_a)  # [C, Q, s, j]
        contrib = jnp.einsum(
            "cq,cqsj,cqst,cqtj->cj", geo.w_detJ, B_a, tangent, B_a
        )  # [C, j]
        cols.append(contrib)
    d_e = jnp.stack(cols, axis=1)  # [C, n, vs]
    return _scatter_add(ndofs, dofmap, d_e)
