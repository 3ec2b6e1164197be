"""Structured-grid fast path: gather-free stencil assembly.

XLA's generic gather/scatter is the one FEM primitive that maps poorly onto
TPU (measured ~23 ms for a 397k x 24 dof gather on v5e — slower than the
entire 1M-QP constitutive update). On a structured tensor grid the
element<->node incidence is a fixed stencil, so:

  * the dof gather  u_e[a] = u[dofmap[:, a]]  becomes an axis-aligned SLICE of
    the displacement grid (zero-copy view for XLA),
  * the residual scatter-add becomes 8 shifted slice-adds into the result grid
    (pure elementwise adds),
  * all cells share one Jacobian, so dN/dx is a tiny [n, g, Q] constant and
    the gradient contraction is a genuine MXU matmul.

This is the production path for the benchmark meshes and any box-structured
domain; `ops.packed.PackedGeometry` remains the general-mesh path with
identical semantics (pinned in tests/solver/test_packed.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import mandel
from .mandel import Constraint
from .packed import IsotropicTangent  # noqa: F401  (re-export convenience)

__all__ = ["StructuredGeometry", "build_structured_geometry"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["dN", "w"],
    meta_fields=["grid", "vs", "ndofs", "constraint", "n_nodes", "n_qp", "n_cells"],
)
@dataclass(frozen=True)
class StructuredGeometry:
    """Uniform-cell tensor-grid geometry.

    dN: [n, g, Q] physical shape gradients (identical for every cell)
    w:  [Q] quadrature weight x |detJ| (identical for every cell)
    grid: cell counts per axis, e.g. (nx, ny, nz)
    """

    dN: jnp.ndarray
    w: jnp.ndarray
    grid: tuple
    vs: int
    ndofs: int
    constraint: Constraint
    n_nodes: int
    n_qp: int
    n_cells: int

    @property
    def N(self) -> int:
        return self.n_qp * self.n_cells

    @property
    def uniform(self) -> bool:
        return True

    # -- stencil kinematics ---------------------------------------------------

    def _corner_offsets(self):
        dims = len(self.grid)
        # local node a = dx + 2 dy + 4 dz (x fastest), matching mesh.py
        return [
            tuple((a >> d) & 1 for d in range(dims)) for a in range(2**dims)
        ]

    def _u_grid(self, u: jnp.ndarray) -> jnp.ndarray:
        shape = tuple(g + 1 for g in self.grid) + (self.vs,)
        return u.reshape(shape)

    def _cell_slices(self, ug: jnp.ndarray, off) -> jnp.ndarray:
        """[*grid, vs] block of node values at a given corner offset."""
        idx = tuple(
            slice(o, o + g) for o, g in zip(off, self.grid)
        )
        return ug[idx]

    def grad(self, u: jnp.ndarray) -> jnp.ndarray:
        """[g, vs, N] displacement gradient, grad[i, j] = d u_j / d x_i."""
        ug = self._u_grid(u)
        g_dim = self.dN.shape[1]
        ues = jnp.stack(
            [
                self._cell_slices(ug, off).reshape(self.n_cells, self.vs)
                for off in self._corner_offsets()
            ],
            axis=0,
        )  # [n, C, vs]
        # contraction over the n=8 corners: an MXU-shaped matmul
        out = jnp.einsum(
            "ngq,ncj->gjqc", self.dN, ues, preferred_element_type=u.dtype
        )
        return out.reshape(g_dim, self.vs, self.N)

    def assemble(self, sig_w: jnp.ndarray) -> jnp.ndarray:
        """sigma-tensor x weight [g, vs, N] -> assembled dof vector [ndofs]."""
        g_dim = sig_w.shape[0]
        s4 = sig_w.reshape(g_dim, self.vs, self.n_qp, self.n_cells)
        # f[n, C, vs] = sum_{i,q} dN[n, i, q] sig_w[i, vs, q, C]
        f = jnp.einsum(
            "niq,ivqc->ncv", self.dN, s4, preferred_element_type=sig_w.dtype
        )
        node_shape = tuple(g + 1 for g in self.grid) + (self.vs,)
        r = jnp.zeros(node_shape, sig_w.dtype)
        for a, off in enumerate(self._corner_offsets()):
            idx = tuple(slice(o, o + g) for o, g in zip(off, self.grid))
            r = r.at[idx].add(f[a].reshape(self.grid + (self.vs,)))
        return r.reshape(-1)

    def residual(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """r = integral eps_m(v) . sigma; sigma [s, N]."""
        M = jnp.asarray(mandel._mandel_matrix_map(self.constraint), sigma.dtype)
        sig_t = jnp.einsum("sij,sN->ijN", M, sigma)
        # q-major weight layout to match the [.., Q, C] reshape in assemble
        wN = jnp.broadcast_to(
            self.w[:, None], (self.n_qp, self.n_cells)
        ).reshape(self.N)
        return self.assemble(sig_t * wN)

    def jacobi_diag(self, tangent) -> jnp.ndarray:
        M = jnp.asarray(mandel._mandel_matrix_map(self.constraint), self.w.dtype)
        node_shape = tuple(g + 1 for g in self.grid) + (self.vs,)
        r = jnp.zeros(node_shape, self.w.dtype)
        wN = jnp.broadcast_to(
            self.w[:, None], (self.n_qp, self.n_cells)
        ).reshape(self.N)
        for a, off in enumerate(self._corner_offsets()):
            dn_a = jnp.broadcast_to(
                self.dN[a][:, :, None],
                (self.dN.shape[1], self.n_qp, self.n_cells),
            ).reshape(self.dN.shape[1], self.N)
            B_a = jnp.einsum("sij,iN->sjN", M, dn_a)  # [s, vs, N]
            q = tangent.quad_diag(B_a) * wN  # [vs, N]
            contrib = (
                q.reshape(self.vs, self.n_qp, self.n_cells)
                .sum(axis=1)
                .T.reshape(self.grid + (self.vs,))
            )
            idx = tuple(slice(o, o + g) for o, g in zip(off, self.grid))
            r = r.at[idx].add(contrib)
        return r.reshape(-1)

    def matvec(self, v: jnp.ndarray, tangent) -> jnp.ndarray:
        from .packed import packed_strain

        eps_v = packed_strain(self.grad(v), self.constraint)
        return self.residual(tangent.apply(eps_v))


def build_structured_geometry(
    space, q_degree: int, constraint: Constraint, dtype=None
) -> StructuredGeometry:
    """Structured geometry for a box mesh produced by unit_cube_mesh('hex') /
    unit_square_mesh('quad') (requires mesh.structured_shape metadata)."""
    from ..fem.elements import tabulate_element
    from ..fem.kinematics import _geometry_grad_at

    dtype = dtype or jnp.result_type(float)
    mesh = space.mesh
    grid = getattr(mesh, "structured_shape", None)
    if grid is None:
        msg = "mesh has no structured_shape metadata; use build_packed_geometry"
        raise ValueError(msg)
    assert space.degree == 1, "structured fast path currently supports degree 1"

    elem, quad = tabulate_element(mesh.cell_type, space.degree, q_degree)
    verts = mesh.nodes[mesh.cells[0]]
    geom_dN = _geometry_grad_at(mesh.cell_type, quad.points)
    J = np.einsum("vi,qvj->qij", verts, geom_dN)
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)
    dN_dx = np.einsum("qaj,qji->qai", elem.dN_dxi, Jinv)  # [Q, n, g]
    w = quad.weights * detJ

    return StructuredGeometry(
        dN=jnp.asarray(dN_dx.transpose(1, 2, 0), dtype),
        w=jnp.asarray(w, dtype),
        grid=tuple(grid),
        vs=space.value_size,
        ndofs=space.ndofs,
        constraint=constraint,
        n_nodes=elem.N.shape[1],
        n_qp=quad.points.shape[0],
        n_cells=int(np.prod(grid)),
    )
